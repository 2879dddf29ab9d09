def test_warmup_compiles_buckets():
    from smh_tpu.ops.warmup import warmup

    warmup(resolutions=((640, 360),))  # tiny bucket; must not raise
