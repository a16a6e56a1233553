"""Procedural generation: SDF structure and level-synchronous chunk builds
(SURVEY.md §7 stage 7)."""

import numpy as np
import jax.numpy as jnp

from octree_tracer_tpu.core import CHUNK_OFFSET
from octree_tracer_tpu.gen import Procedural, island_sdf, simplex_noise3, smin
from octree_tracer_tpu.gen.noise import sdf_box, sdf_cone
from octree_tracer_tpu.gen.procedural import BLOCK_GRASS, BLOCK_STONE, _block_grid


def test_simplex_noise_range_and_determinism():
    pts = jnp.asarray(
        np.random.default_rng(0).uniform(-2, 2, (256, 3)).astype(np.float32)
    )
    n1 = np.asarray(simplex_noise3(pts))
    n2 = np.asarray(simplex_noise3(pts))
    np.testing.assert_array_equal(n1, n2)
    assert np.all(np.abs(n1) <= 1.5)
    assert n1.std() > 0.05  # not degenerate


def test_sdf_box_signs():
    inside = float(sdf_box(jnp.asarray([0.0, 0.0, 0.0]), (1.0, 1.0, 1.0)))
    outside = float(sdf_box(jnp.asarray([3.0, 0.0, 0.0]), (1.0, 1.0, 1.0)))
    assert inside < 0 < outside


def test_sdf_cone_signs():
    # cone(p, c=(0.5,0.5), h=0.9): apex at origin opening downward
    inside = float(sdf_cone(jnp.asarray([0.0, -0.5, 0.0]), (0.5, 0.5), 0.9))
    outside = float(sdf_cone(jnp.asarray([2.0, 0.5, 0.0]), (0.5, 0.5), 0.9))
    assert inside < 0 < outside


def test_smin_blends():
    assert float(smin(1.0, 5.0, 0.2)) <= 1.0
    assert float(smin(5.0, 1.0, 0.2)) <= 1.0


def test_island_sdf_has_surface():
    xs = np.linspace(-1, 1, 17, dtype=np.float32)
    grid = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    v = np.asarray(island_sdf(jnp.asarray(grid)))
    assert np.isfinite(v).all()
    assert (v < 0).any() and (v > 0).any()


def test_block_grid_grass_over_stone():
    """Grass blocks must sit where the cell above is outside
    (reference: src/procedual.wgsl:189-201)."""
    pos = jnp.asarray(np.array([-1.0, -1.0, -1.0], dtype=np.float32))
    grid = np.asarray(_block_grid(pos, 5, 0, x_slabs=4))
    assert grid.shape == (32, 32, 32)
    occupied = grid > 0
    assert occupied.any()
    assert set(np.unique(grid)).issubset({0, BLOCK_STONE, BLOCK_GRASS})
    # every grass cell has an empty (or out-of-chunk) cell above it
    gx, gy, gz = np.nonzero(grid == BLOCK_GRASS)
    inside = gy < 31
    assert np.all(grid[gx[inside], gy[inside] + 1, gz[inside]] == 0)
    # stone cells are covered: the cell above is inside the SDF too
    sx, sy, sz = np.nonzero(grid == BLOCK_STONE)
    inside = sy < 31
    assert np.all(grid[sx[inside], sy[inside] + 1, sz[inside]] != 0)


def test_generate_chunk_builds_block_tree():
    proc = Procedural(chunk_depth=5)
    chunk = proc.generate_chunk(np.array([-1.0, -1.0, -1.0]), 0)
    assert chunk is not None
    ptr = chunk.pointers
    blocks = ptr[ptr > CHUNK_OFFSET] - CHUNK_OFFSET
    assert set(np.unique(blocks)).issubset({BLOCK_STONE, BLOCK_GRASS})
    # cross-check one occupied cell via find_voxel
    pos_grid = np.asarray(
        _block_grid(jnp.asarray(np.array([-1.0, -1.0, -1.0], np.float32)), 5, 0,
                    x_slabs=4)
    )
    occ = np.argwhere(pos_grid > 0)
    cell = occ[len(occ) // 2]
    p = cell.astype(np.float32) / 32 * 2 - 1
    idx, depth, _ = chunk.find_voxel(p)
    assert depth == 5
    assert int(chunk.pointers[idx]) == int(CHUNK_OFFSET) + int(
        pos_grid[tuple(cell)]
    )


def test_generate_chunk_empty_returns_none():
    proc = Procedural(chunk_depth=4)
    # far above the island: nothing inside
    chunk = proc.generate_chunk(np.array([-1.0, 10.0, -1.0]), 4)
    assert chunk is None


def test_generate_world_end_to_end(tmp_path):
    from octree_tracer_tpu.world.world import World

    world = World(load_blocks=False)
    proc = Procedural(chunk_depth=4)
    world.generate_world(str(tmp_path), proc, world_depth=1)
    # root written and loadable; generated chunks stream back in
    loaded = World.load_world(str(tmp_path), load_blocks=False)
    root = loaded.chunks[0]
    refs = root.pointers[root.pointers > CHUNK_OFFSET] - CHUNK_OFFSET
    assert all(r >= int(CHUNK_OFFSET) // 2 for r in refs.tolist())
    assert len(refs) > 0
