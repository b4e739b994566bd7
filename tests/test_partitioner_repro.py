"""Pinned minimal repro of the TP×SP GSPMD miscompilation.

`parallel/mesh.py shard_compiled` REFUSES tensor_parallel +
spatial_parallel because this stack's SPMD partitioner returns wrong
values for a conv whose lhs is spatially sharded while its rhs is
output-feature sharded (docs/MEASUREMENTS.md "Spatial partitioning (SP) +
a partitioner miscompilation").  This test pins the raw-JAX repro:

  * it PASSES while the stack is still broken (the miscompile is present,
    so the refusal stays justified), and
  * it FAILS the moment a jax/XLA upgrade fixes the partitioner — the
    signal to delete this file and lift the TP×SP refusal in
    parallel/mesh.py (README parallelism-matrix footnote).
"""

import numpy as np
import pytest


def _tp_sp_maxdiff():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "spatial", "model"))

    rng = np.random.default_rng(0)
    lhs = rng.normal(0, 1, (4, 8, 16, 16)).astype(np.float32)   # NCHW
    rhs = rng.normal(0, 1, (3, 3, 8, 16)).astype(np.float32)    # HWIO

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            precision=jax.lax.Precision.HIGHEST,
        )

    want = jax.jit(conv)(lhs, rhs)  # unsharded truth

    lhs_s = jax.device_put(
        lhs, NamedSharding(mesh, P("data", None, "spatial", None))
    )
    rhs_s = jax.device_put(
        rhs, NamedSharding(mesh, P(None, None, None, "model"))
    )
    got = jax.jit(conv)(lhs_s, rhs_s)
    return float(jnp.max(jnp.abs(got - want)))


def test_tp_sp_miscompile_still_present():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    maxdiff = _tp_sp_maxdiff()
    # Each sharding ALONE is exact (<1e-5); combined, the partitioner
    # returns O(1)-wrong values on this stack.  If this assert trips, the
    # backend was fixed: delete this test and lift the refusal in
    # parallel/mesh.py shard_compiled (+ README matrix footnote).
    assert maxdiff > 1e-2, (
        f"TP×SP conv now matches (maxdiff={maxdiff:.2e}) — the SPMD "
        "partitioner appears FIXED on this jax/XLA; lift the TP×SP "
        "refusal in parallel/mesh.py and delete this pinned repro"
    )


def test_each_sharding_alone_exact():
    """Control: spatial-only and model-only shardings are exact — the
    wrongness is specific to the combination."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    devs = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "spatial", "model"))
    rng = np.random.default_rng(0)
    lhs = rng.normal(0, 1, (4, 8, 16, 16)).astype(np.float32)
    rhs = rng.normal(0, 1, (3, 3, 8, 16)).astype(np.float32)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            precision=jax.lax.Precision.HIGHEST,
        )

    want = jax.jit(conv)(lhs, rhs)
    sp_only = jax.jit(conv)(
        jax.device_put(
            lhs, NamedSharding(mesh, P("data", None, "spatial", None))
        ),
        rhs,
    )
    tp_only = jax.jit(conv)(
        lhs,
        jax.device_put(rhs, NamedSharding(mesh, P(None, None, None, "model"))),
    )
    np.testing.assert_allclose(np.asarray(sp_only), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tp_only), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
