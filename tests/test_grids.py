import pytest

from multigridanisotropicdiffusion_tpu.core.grids import (
    CELL,
    VERTEX,
    build_level_descriptors,
    coarsen_centering,
    coarsen_size,
)


def test_coarsen_rules():
    # even -> s/2 cell-centered; odd -> (s-1)/2+1 vertex-centered
    assert coarsen_size(512) == 256 and coarsen_centering(512) == CELL
    assert coarsen_size(9) == 5 and coarsen_centering(9) == VERTEX
    assert coarsen_size(7) == 4 and coarsen_centering(7) == VERTEX


def test_levels_512():
    levels = build_level_descriptors((512, 512))
    shapes = [l.shape for l in levels]
    # 512 -> 256 -> 128 -> 64 -> 32 -> 16 -> 8 (4 would be < 6, rejected)
    assert shapes == [(s, s) for s in (512, 256, 128, 64, 32, 16, 8)]
    assert levels[-1].spacing == (64.0, 64.0)
    assert all(l.centering == (CELL, CELL) for l in levels[1:])


def test_levels_stop_on_shortest_dim():
    # (512, 8): first halving gives (256, 4) -> rejected; only the fine level.
    levels = build_level_descriptors((512, 8))
    assert [l.shape for l in levels] == [(512, 8)]


def test_levels_ved_volume():
    # the reference VED test volume: 69x77x69
    levels = build_level_descriptors((69, 77, 69), (0.3125, 0.3125, 0.5))
    shapes = [l.shape for l in levels]
    assert shapes[0] == (69, 77, 69)
    assert shapes[1] == (35, 39, 35)  # odd sizes -> vertex
    assert levels[1].centering == (VERTEX, VERTEX, VERTEX)
    assert shapes[2] == (18, 20, 18)
    assert levels[2].centering == (VERTEX, VERTEX, VERTEX)
    assert shapes[3] == (9, 10, 9)
    assert levels[3].centering == (CELL, CELL, CELL)
    # next would be (5, 5, 5) -> rejected
    assert len(levels) == 4
    assert levels[3].spacing == (0.3125 * 8, 0.3125 * 8, 0.5 * 8)


def test_mixed_centering():
    levels = build_level_descriptors((16, 17))
    assert levels[1].shape == (8, 9)
    assert levels[1].centering == (CELL, VERTEX)
    assert levels[2].shape == (4, 5) if len(levels) > 2 else True
    # (8,9) -> (4,5): 4 < 6 -> rejected, so only 2 levels
    assert len(levels) == 2


def test_coarsest_bounds():
    for shape in [(512, 512), (69, 77, 69), (100, 200), (31, 31, 31)]:
        levels = build_level_descriptors(shape)
        assert all(6 <= s for s in levels[-1].shape)
        for l in levels:
            assert all(s >= 6 for s in l.shape)
