"""Direct unit tests for the halo-exchange primitive on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from esp32_fluid_simulation_tpu.parallel import make_mesh
from esp32_fluid_simulation_tpu.parallel.halo import exchange_halo

F = np.float32


def _run_exchange(x_global, width, bc):
    """Exchange along the x mesh axis (array dim 0), return padded blocks
    reassembled for inspection."""
    mesh = make_mesh(jax.devices()[:4], grid_shape=(4, 1))

    def local(x):
        return exchange_halo(x, width, 0, "x", 4, bc)

    fn = shard_map(local, mesh=mesh, in_specs=(P("x", None),),
                   out_specs=P("x", None), check_vma=False)
    return np.asarray(jax.jit(fn)(x_global))


def test_halo_interior_strips_travel():
    x = jnp.arange(16 * 4, dtype=F).reshape(16, 4)
    out = _run_exchange(x, 1, "zero")  # each block 4 rows -> 6 with ghosts
    assert out.shape == (24, 4)
    # block 1 (rows 6..12): lo ghost == last row of block 0 (global row 3)
    np.testing.assert_array_equal(out[6], np.asarray(x[3]))
    # block 1 hi ghost == first row of block 2 (global row 8)
    np.testing.assert_array_equal(out[11], np.asarray(x[8]))


def test_halo_global_edges_by_bc():
    x = jnp.arange(16 * 4, dtype=F).reshape(16, 4) + 1
    z = _run_exchange(x, 1, "zero")
    np.testing.assert_array_equal(z[0], 0)          # global low ghost
    np.testing.assert_array_equal(z[-1], 0)         # global high ghost
    e = _run_exchange(x, 1, "edge")
    np.testing.assert_array_equal(e[0], np.asarray(x[0]))
    np.testing.assert_array_equal(e[-1], np.asarray(x[-1]))
    r = _run_exchange(x, 1, "reflect_neg")
    np.testing.assert_array_equal(r[0], -np.asarray(x[0]))
    np.testing.assert_array_equal(r[-1], -np.asarray(x[-1]))


def test_halo_wide_strips():
    x = jnp.arange(32 * 4, dtype=F).reshape(32, 4)
    out = _run_exchange(x, 3, "zero")  # blocks of 8 -> 14 with ghosts
    assert out.shape == (14 * 4, 4)
    # block 2 (rows 28..42): its 3-wide lo ghost = global rows 13,14,15
    np.testing.assert_array_equal(out[28:31], np.asarray(x[13:16]))
    # block 2 hi ghost = global rows 24,25,26
    np.testing.assert_array_equal(out[39:42], np.asarray(x[24:27]))


def test_halo_single_shard_mesh():
    """n_shards=1: no collectives, pure BC padding."""
    mesh = make_mesh(jax.devices()[:1], grid_shape=(1, 1))

    def local(x):
        return exchange_halo(x, 2, 0, "x", 1, "edge")

    fn = shard_map(local, mesh=mesh, in_specs=(P("x", None),),
                   out_specs=P("x", None), check_vma=False)
    x = jnp.arange(8, dtype=F).reshape(4, 2)
    out = np.asarray(jax.jit(fn)(x))
    np.testing.assert_array_equal(out[0], out[1])
    np.testing.assert_array_equal(out[0], np.asarray(x[0]))
    np.testing.assert_array_equal(out[-1], np.asarray(x[-1]))
