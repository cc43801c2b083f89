"""Ring attention over the sp axis vs dense causal attention — the
long-context scaling story (SURVEY.md §2.3 'sequence parallel: design
fresh'), validated on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.ops.layers import attention
from llama_cpp_q_4_0_tpu.parallel import make_mesh
from llama_cpp_q_4_0_tpu.parallel.ring_attention import ring_self_attention
from llama_cpp_q_4_0_tpu.parallel.shard import _put
from jax.sharding import PartitionSpec as P


def _dense_causal(q, k, v, scale):
    b, t = q.shape[:2]
    pos = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    mask = jnp.ones((b, t), bool)
    return attention(q, k, v, pos, mask, scale)


@pytest.mark.parametrize("sp,heads,kv_heads", [(4, 4, 4), (2, 4, 1)])
def test_ring_matches_dense(sp, heads, kv_heads):
    rng = np.random.default_rng(0)
    b, t, d = 2, 32, 16
    q = jnp.asarray(rng.standard_normal((b, t, heads, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, kv_heads, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, kv_heads, d)), jnp.float32)
    scale = 0.25

    ref = np.asarray(_dense_causal(q, k, v, scale))

    mesh = make_mesh(dp=1, sp=sp, tp=1)
    spec = P(None, "sp", None, None)
    qs = _put(q, mesh, spec)
    ks = _put(k, mesh, spec)
    vs = _put(v, mesh, spec)
    got = np.asarray(ring_self_attention(qs, ks, vs, mesh, scale=scale))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_ring_first_token_rows_finite():
    """Rows whose only valid key is themselves (first shard, first token)
    must not NaN from the masked-softmax bookkeeping."""
    rng = np.random.default_rng(1)
    b, t, h, d = 1, 16, 2, 8
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    mesh = make_mesh(dp=1, sp=4, tp=1)
    spec = P(None, "sp", None, None)
    out = ring_self_attention(
        _put(q, mesh, spec), _put(q, mesh, spec), _put(q, mesh, spec), mesh)
    assert np.isfinite(np.asarray(out)).all()
