import numpy as np

from lfdtpu.ops import points as P


def test_feature_map_sizes():
    # ceil-division per stride (reference analytic rule, lfd.py:712-720)
    sizes = P.feature_map_sizes_for_input((480, 640), (8, 16, 32, 64, 128))
    assert sizes == ((60, 80), (30, 40), (15, 20), (8, 10), (4, 5))
    sizes = P.feature_map_sizes_for_input((1080, 1920), (8, 16))
    assert sizes == ((135, 240), (68, 120))


def test_point_coordinates_match_reference_grid():
    # x varies fastest, no half-stride offset (lfd.py:91-100)
    pts = P.generate_point_coordinates([(2, 3)], [8])[0]
    expected = np.array(
        [[0, 0], [8, 0], [16, 0], [0, 8], [8, 8], [16, 8]], dtype=np.float32
    )
    np.testing.assert_array_equal(pts, expected)


def test_concat_level_info():
    info = P.concat_level_info(
        [(2, 2), (1, 1)],
        [8, 16],
        [(0, 64), (64, 128)],
        gray_ranges=[(0, 70), (57, 141)],
    )
    assert info["points"].shape == (5, 2)
    np.testing.assert_array_equal(info["strides"], [8, 8, 8, 8, 16])
    np.testing.assert_array_equal(info["ranges"][-1], [64, 128])
    np.testing.assert_array_equal(info["gray_ranges"][0], [0, 70])
    np.testing.assert_array_equal(info["level_ids"], [0, 0, 0, 0, 1])


def test_gray_ranges_int_truncation():
    # int(low*0.9), int(up*1.1) — lfd.py:48-49
    got = P.compute_gray_ranges(((4, 20), (20, 40)), (0.9, 1.1))
    assert got == ((3, 22), (18, 44))
