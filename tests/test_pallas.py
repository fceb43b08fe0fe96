"""Pallas kernel correctness (interpreter mode on CPU; the real-TPU path is
exercised by bench.py and the TOTSU_PALLAS=1 A/B)."""

import numpy as np
import jax.numpy as jnp
import pytest

from totsu_tpu.ops.pallas.dual_matvec import (
    dual_matvec_f32, dual_matvec_reference,
)


@pytest.mark.parametrize("m,n", [(256, 128), (173, 77), (8, 128), (300, 500)])
def test_dual_matvec_interpret(m, n):
    rng = np.random.default_rng(0)
    a = rng.normal(size=(m, n)).astype(np.float32)
    u = rng.normal(size=n).astype(np.float32)
    v = rng.normal(size=m).astype(np.float32)
    p, q = dual_matvec_f32(jnp.asarray(a), jnp.asarray(u), jnp.asarray(v),
                           interpret=True)
    np.testing.assert_allclose(np.asarray(p), a @ u, rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(q), v @ a, rtol=2e-4, atol=1e-4)


def test_reference_fallback_matches():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(64, 32))
    u = rng.normal(size=32)
    v = rng.normal(size=64)
    p, q = dual_matvec_reference(jnp.asarray(a), jnp.asarray(u),
                                 jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(p), a @ u, atol=1e-10)
    np.testing.assert_allclose(np.asarray(q), v @ a, atol=1e-10)


def test_dual_matvec_bf16_storage_interpret():
    # bf16-stored A streams at half the bytes; math must match the f32
    # reference applied to the *rounded* matrix exactly (accumulation in f32)
    rng = np.random.default_rng(2)
    a = rng.normal(size=(173, 77)).astype(np.float32)
    u = rng.normal(size=77).astype(np.float32)
    v = rng.normal(size=173).astype(np.float32)
    a_bf = jnp.asarray(a).astype(jnp.bfloat16)
    p, q = dual_matvec_f32(a_bf, jnp.asarray(u), jnp.asarray(v),
                           interpret=True)
    a_rounded = np.asarray(a_bf.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(p), a_rounded @ u,
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(q), v @ a_rounded,
                               rtol=2e-4, atol=1e-4)
