from smh_tpu import consts as C


def test_map_geometry_1080p():
    # Hand-computed from the reference ROI fractions at 1920x1080
    # (vision-common/src/consts/mod.rs:7-19 + vision-cpu/src/lib.rs:137-145).
    g = C.map_geometry(1920, 1080)
    assert (g.map_x, g.map_y, g.map_w, g.map_h) == (914, 178, 986, 822)
    assert (g.brq_w, g.brq_h) == (493, 411)
    assert (g.brq_x, g.brq_y) == (914 + 493, 178 + 411)
    # Close button: w=round(0.236132813*1080)=255, h=round(0.038205295*1080)=41,
    # x = 1920 - round(8.4375) - 255 = 1657, y = 1080 - 8 - 41 = 1031.
    assert (g.btn_x, g.btn_y, g.btn_w, g.btn_h) == (1657, 1031, 255, 41)


def test_map_geometry_4k():
    g = C.map_geometry(3840, 2160)
    assert g.map_w == 3840 - round(0.864930556 * 2160)
    assert g.map_h == round(0.761078559 * 2160)
    assert g.map_x + g.map_w <= 3840 and g.map_y + g.map_h <= 2160
    assert g.btn_x + g.btn_w <= 3840 and g.btn_y + g.btn_h <= 2160


def test_consts_values():
    assert C.FIND_MARKER_HSV_MIN_SAT == 35
    assert C.ALPHA_MARKER_COLOR_HSV == (105, 100, 100)
    assert C.LSD_MAX_LINES == 32
    assert C.LSD_MIN_LENGTH_SQR == 2500.0


def test_c_header_codegen():
    hdr = C.generate_c_header()
    assert "static const uint16_t ALPHA_MARKER_COLOR_HSV[3] = {105, 100, 100};" in hdr
    assert "static const float CLOSE_DEPLOYMENT_BUTTON_RED_PIXEL_THRESHOLD" in hdr
