import pytest

pytestmark = pytest.mark.slow  # jit-compile heavy (see pyproject markers)


def test_warmup_compiles_buckets():
    from smh_tpu.ops.warmup import warmup

    warmup(resolutions=((640, 360),))  # tiny bucket; must not raise
