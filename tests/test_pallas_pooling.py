"""Fused Pallas stats-pooling kernel vs the reference masked pooling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asv_subtools_tpu.nn.pallas_pooling import fused_stats_pooling
from asv_subtools_tpu.nn.pooling import StatisticsPooling


class TestFusedStatsPooling:
    @pytest.mark.parametrize("t,d", [(700, 200), (512, 128), (65, 30), (1500, 80)])
    def test_matches_masked_pooling(self, t, d):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(3, t, d)), jnp.float32)
        lengths = jnp.asarray([t, max(1, t // 2), max(1, t // 7)])
        mask = jnp.arange(t)[None, :] < lengths[:, None]
        out = fused_stats_pooling(x, mask, interpret=True)
        pool = StatisticsPooling()
        v = pool.init({"params": jax.random.PRNGKey(0)}, x, mask=mask)
        ref = pool.apply(v, x, mask=mask)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
        )

    def test_no_mask(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 300, 64)), jnp.float32)
        out = fused_stats_pooling(x, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out[:, :64]), np.asarray(x.mean(axis=1)), rtol=1e-5, atol=1e-5
        )
