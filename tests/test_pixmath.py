import numpy as np

from smh_tpu import testing
from smh_tpu.vision import pixmath as pm


def test_hsv_known_values():
    rgb = np.array(
        [
            [255, 0, 0],  # red -> (0, 100, 100)
            [0, 255, 0],  # green -> (120, 100, 100)
            [0, 0, 255],  # blue -> (240, 100, 100)
            [0, 0, 0],  # black -> (0, 0, 0); s is NaN->0 in the oracle
            [255, 255, 255],  # white -> (0, 0, 100)
            [64, 255, 0],  # alpha marker color -> h ~ 104-105, s=100, v=100
        ],
        dtype=np.uint8,
    )
    h, s, v = pm.rgb_to_hsv_u8(rgb)
    assert (h[0], s[0], v[0]) == (0, 100, 100)
    assert (h[1], s[1], v[1]) == (120, 100, 100)
    assert (h[2], s[2], v[2]) == (240, 100, 100)
    assert (h[3], s[3], v[3]) == (0, 0, 0)
    assert (h[4], s[4], v[4]) == (0, 0, 100)
    assert abs(int(h[5]) - 105) <= 1 and s[5] == 100 and v[5] == 100


def test_marker_classifier():
    rgb = np.array(
        [
            testing.ALPHA_MARKER_RGB,
            [0, 0, 0],
            [255, 255, 255],
            [90, 80, 70],  # synthetic background
            [255, 0, 0],  # red: hue 0 not near any fireteam hue
        ],
        dtype=np.uint8,
    )
    ok = pm.is_any_map_marker_color(rgb)
    assert ok.tolist() == [True, False, False, False, False]


def test_luma_truncation():
    rgb = np.array([[255, 255, 255], [0, 0, 0], [100, 200, 50]], dtype=np.uint8)
    l = pm.luma8(rgb)
    assert l[0] == 254 or l[0] == 255  # 0.2126+0.7152+0.0722 = 0.99999... in f32
    assert l[1] == 0
    expected = int(
        np.float32(0.2126) * np.float32(100)
        + np.float32(0.7152) * np.float32(200)
        + np.float32(0.0722) * np.float32(50)
    )
    assert l[2] == expected


def test_monochromaticy():
    rgb = np.array([[200, 200, 200], [200, 210, 190]], dtype=np.uint8)
    m = pm.ocr_monochromaticy(rgb)
    assert m[0] == 0
    assert m[1] == 2 * (10 + 10 + 20)


def test_ocr_preprocess_strict_and_edge():
    h, w = 32, 48
    rgb = np.full((h, w, 3), 60, dtype=np.uint8)
    # strict pixel block (bright, monochrome)
    rgb[10:12, 10:12] = 230
    # edge pixel adjacent: moderately bright, near-monochrome
    rgb[10, 13] = [150, 150, 160]  # mono = 2*(0+10+10)=40 <= 48, min 150 >= 130
    out = pm.ocr_preprocess(rgb)
    assert out[10, 10] == 255 - int(pm.luma8(rgb[10, 10][None])[0])
    assert out[10, 13] != 255  # kept via edge rule (strict pixel within radius 3)
    assert out[0, 0] == 255  # background dropped
    # edge pixel with no strict pixel nearby is dropped
    rgb2 = np.full((h, w, 3), 60, dtype=np.uint8)
    rgb2[10, 13] = [150, 150, 160]
    assert pm.ocr_preprocess(rgb2)[10, 13] == 255


def test_dilate_l1():
    m = np.zeros((5, 5), dtype=np.uint8)
    m[2, 2] = 255
    d = pm.dilate_l1_radius1(m)
    assert d[2, 2] == d[1, 2] == d[3, 2] == d[2, 1] == d[2, 3] == 255
    assert d[1, 1] == 0  # diagonal not in the L1 ball of radius 1
    assert d.sum() == 255 * 5
