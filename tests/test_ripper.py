import sys

import numpy as np
import pytest

from smh_tpu.heightmaps import ripper

STUB = [sys.executable, "-m", "smh_tpu.heightmaps.stub_ripper"]


def stub_invoke(args, exe):
    import subprocess

    proc = subprocess.run([*STUB, *args], capture_output=True, timeout=60)
    assert proc.returncode == 0, proc.stderr
    return proc.stdout


@pytest.fixture(autouse=True)
def use_stub(monkeypatch):
    monkeypatch.setattr(ripper, "_invoke", stub_invoke)


def test_list_maps_filters_layers():
    maps = ripper.list_maps(["paks"], None)
    assert "SquadGame/Content/Maps/Mutaha/Mutaha.umap" in maps
    assert all("lighting_layers" not in m for m in maps)
    assert all("/Content/Maps/" in m for m in maps)
    assert len(maps) == 3


def test_get_heightmap_roundtrip():
    hm = ripper.get_heightmap(["paks"], "0xAES", "SquadGame/Content/Maps/Mutaha/Mutaha.umap")
    assert hm is not None
    assert (hm.width, hm.height) == (257, 257)
    assert hm.bounds == ((-100, -100), (100, 100))
    assert hm.scale == (100.0, 100.0, 512.0)
    assert hm.data.dtype == np.uint16 and hm.data.shape == (257, 257)
    # deterministic per map path
    hm2 = ripper.get_heightmap(["paks"], None, "SquadGame/Content/Maps/Mutaha/Mutaha.umap")
    assert (hm.data == hm2.data).all()


def test_get_heightmap_empty():
    assert ripper.get_heightmap(["paks"], None, "SquadGame/Content/Maps/Empty/Empty.umap") is None


def test_smhhm_cache_roundtrip(tmp_path):
    from smh_tpu.squadex import heightmaps as hms

    hm = ripper.get_heightmap(["paks"], None, "SquadGame/Content/Maps/Narva/Narva_RAAS_v1.umap")
    path = tmp_path / "narva.smhhm"
    hms.save_smhhm(path, hm)
    hm2 = hms.load_smhhm(path)
    assert hm2 is not None and (hm2.data == hm.data).all()
    assert hm2.bounds == hm.bounds and hm2.scale == hm.scale


def _mk_steam_tree(tmp_path):
    """Build a fake Steam install: main library + one extra library from
    libraryfolders.vdf, Squad in the extra library, with workshop paks."""
    root = tmp_path / "Steam"
    (root / "steamapps").mkdir(parents=True)
    lib2 = tmp_path / "SteamLibrary"
    steamapps = lib2 / "steamapps"
    squad = steamapps / "common" / "Squad"
    (squad / "SquadGame" / "Content" / "Paks").mkdir(parents=True)
    (root / "steamapps" / "libraryfolders.vdf").write_text(
        '"libraryfolders"\n{\n\t"0"\n\t{\n\t\t"path"\t\t"%s"\n\t}\n}\n' % lib2
    )
    ws = steamapps / "workshop" / "content" / str(ripper.SQUAD_APP_ID)
    for mod, ok in [("111", True), ("222", True), ("333", False)]:
        d = ws / mod / ("WindowsNoEditor" if ok else "LinuxNoEditor")
        d.mkdir(parents=True)
        (d / "mod.pak").write_bytes(b"\0")
    # a stray non-pak file in a WindowsNoEditor dir must not add a dir
    (ws / "444" / "WindowsNoEditor").mkdir(parents=True)
    (ws / "444" / "WindowsNoEditor" / "readme.txt").write_text("x")
    return root, squad, ws


def test_find_squad_dir_via_libraryfolders(tmp_path):
    root, squad, _ = _mk_steam_tree(tmp_path)
    assert ripper.find_squad_dir([root]) == squad
    assert ripper.find_squad_dir([tmp_path / "nope"]) is None


def test_find_workshop_paks(tmp_path):
    _, squad, ws = _mk_steam_tree(tmp_path)
    paks = ripper.find_workshop_paks(squad)
    assert paks == sorted(
        [str(ws / "111" / "WindowsNoEditor"), str(ws / "222" / "WindowsNoEditor")]
    )


def test_discover_paks(tmp_path):
    root, squad, _ = _mk_steam_tree(tmp_path)
    paks = ripper.discover_paks([root])
    # workshop paks first, then the main game paks dir (heightmaps.rs load_layers)
    assert paks[-1] == str(squad / "SquadGame" / "Content" / "Paks")
    assert len(paks) == 3
    assert ripper.discover_paks([tmp_path / "nope"]) == []
