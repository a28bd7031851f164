"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4.4:
the reference has no distributed tests — nothing to distribute; these validate
the new TPU-native parallel layer)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from llm_qat_tpu.models import (
    TrainConfig,
    init_sp_params,
    prec_tables,
    sp_forward,
    tiny_test_config,
)
from llm_qat_tpu.parallel import (
    batch_sharding,
    make_mesh,
    shard_params,
    sp_param_specs,
)
from llm_qat_tpu.train import CalibrationManager
from llm_qat_tpu.train.sp_trainer import make_sp_train_step


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    cfg = tiny_test_config((4, 32))
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batches = [jnp.asarray(rng.integers(0, cfg.model.vocab_size, (4, 16)))]
    mgr = CalibrationManager(cfg, 1)
    params = mgr.calibrate_all_precisions(params, batches)
    return cfg, params, batches


class TestSpecs:
    def test_spec_shapes_consistent(self, setup):
        cfg, params, _ = setup
        specs = sp_param_specs(params)
        # column-parallel weight shards out axis
        assert specs["blocks"]["c_attn"]["w"] == P(None, None, "model")
        # its per-channel scale bank shards the same axis
        assert specs["blocks"]["c_attn"]["wq_scale"] == P(None, None, "model")
        # row-parallel weight shards in axis; input scale shards with it
        assert specs["blocks"]["mlp_proj"]["w"] == P(None, "model", None)
        assert specs["blocks"]["mlp_proj"]["iq_scale"] == P(None, None, "model")
        assert specs["wte"] == P("model", None)


class TestShardedExecution:
    def test_tp_forward_matches_single_device(self, setup):
        cfg, params, batches = setup
        tables = prec_tables(cfg.quant)
        ids = batches[0]

        want = np.asarray(
            sp_forward(params, ids, 0, cfg, tables=tables)["logits"]
        )

        mesh = make_mesh(n_data=2, n_model=4)
        sharded, _ = shard_params(params, mesh)
        ids_sh = jax.device_put(ids, batch_sharding(mesh))

        @jax.jit
        def fwd(p, i):
            return sp_forward(p, i, 0, cfg, tables=tables)["logits"]

        got = np.asarray(fwd(sharded, ids_sh))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_tp_dp_train_step_runs(self, setup):
        """Full training step jitted over the 2x4 mesh: TP+DP end-to-end."""
        cfg, params, batches = setup
        tcfg = TrainConfig(gradient_accumulation_steps=2, num_iterations=10)
        init_state, train_step = make_sp_train_step(cfg, tcfg)

        mesh = make_mesh(n_data=2, n_model=4)
        sharded, _ = shard_params(params, mesh)
        state = init_state(sharded)
        ids = jax.device_put(batches[0], batch_sharding(mesh))

        new_state, metrics = jax.jit(train_step)(state, ids, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        # sharding preserved on updated params
        w_shard = new_state.params["blocks"]["c_attn"]["w"].sharding
        assert w_shard.spec == P(None, None, "model")
