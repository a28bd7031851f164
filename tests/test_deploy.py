"""Checkpoint round-trip + INT8 export tests (reference coverage model:
`part5_squad/tests/test_eval_squad.py:85-254` checkpoint round-trips;
`part1 deploy.py:5-183`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_qat_tpu.deploy import (
    export_int8,
    load_checkpoint,
    save_checkpoint,
    save_per_bit_checkpoints,
)
from llm_qat_tpu.models import init_sp_params, prec_tables, sp_forward, tiny_test_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config((4, 8, 32))
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


class TestCheckpointRoundtrip:
    def test_exact_roundtrip(self, setup, tmp_path):
        cfg, params = setup
        p = tmp_path / "ckpt.npz"
        assert save_checkpoint(p, params, cfg, bit_width=8)
        loaded, meta = load_checkpoint(p)
        assert meta["bit_width"] == 8
        assert meta["config"]["model"]["n_embd"] == cfg.model.n_embd
        for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(loaded)[0],
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_forward_after_reload(self, setup, tmp_path):
        cfg, params = setup
        tables = prec_tables(cfg.quant)
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 200, (1, 8)))
        want = np.asarray(sp_forward(params, ids, 2, cfg, tables=tables)["logits"])
        save_checkpoint(tmp_path / "c.npz", params, cfg)
        loaded, _ = load_checkpoint(tmp_path / "c.npz")
        got = np.asarray(sp_forward(loaded, ids, 2, cfg, tables=tables)["logits"])
        np.testing.assert_array_equal(got, want)

    def test_per_bit_files(self, setup, tmp_path):
        cfg, params = setup
        paths = save_per_bit_checkpoints(tmp_path, params, cfg)
        assert set(paths) == {4, 8}
        _, meta = load_checkpoint(paths[4])
        assert meta["bit_width"] == 4


class TestInt8Export:
    def test_export_compresses(self, setup):
        cfg, params = setup
        tree, report = export_int8(params, cfg)
        assert report["compression_ratio"] > 1.5
        w = tree["blocks"]["c_fc"]["w"]
        assert w["int8"].dtype == np.int8
        # dequantized weights approximate originals
        deq = w["int8"].astype(np.float32) * w["scale"]
        orig = np.asarray(params["blocks"]["c_fc"]["w"])
        assert np.max(np.abs(deq - orig)) <= float(w["scale"]) * 0.51 + 1e-6

    def test_lora_stays_float(self, setup):
        cfg, params = setup
        tree, _ = export_int8(params, cfg)
        assert tree["blocks"]["c_fc"]["lora_A"].dtype == np.float32


class TestElasticCheckpoints:
    """Async saves + preemption restore (SURVEY §5: absent in reference)."""

    def _state(self, seed=0):
        import optax
        from llm_qat_tpu.models import init_sp_params, tiny_test_config

        cfg = tiny_test_config((4, 32))
        params = init_sp_params(jax.random.PRNGKey(seed), cfg)
        opt = optax.adam(1e-3)
        return {"params": params, "opt": opt.init(params),
                "step": jnp.int32(seed)}

    def test_roundtrip_with_optimizer_state(self, tmp_path):
        from llm_qat_tpu.deploy import AsyncCheckpointManager

        mgr = AsyncCheckpointManager(tmp_path)
        state = self._state(3)
        mgr.save(3, state)
        mgr.wait()
        got = mgr.restore_latest(self._state(0))
        assert got is not None
        step, restored, meta = got
        assert step == 3 and meta["step"] == 3
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_keep_gc_and_latest(self, tmp_path):
        from llm_qat_tpu.deploy import AsyncCheckpointManager

        mgr = AsyncCheckpointManager(tmp_path, keep=2)
        for s in (1, 2, 3, 4):
            mgr.save(s, {"x": jnp.full((4,), s)})
            mgr.wait()
        assert mgr.latest_step() == 4
        assert sorted(mgr._steps()) == [3, 4]

    def test_corrupt_latest_falls_back(self, tmp_path):
        from llm_qat_tpu.deploy import AsyncCheckpointManager

        mgr = AsyncCheckpointManager(tmp_path)
        mgr.save(1, {"x": jnp.ones((4,))})
        mgr.wait()
        mgr.save(2, {"x": jnp.full((4,), 2.0)})
        mgr.wait()
        (tmp_path / "step_0000000002.npz").write_bytes(b"torn write")
        got = mgr.restore_latest({"x": jnp.zeros((4,))})
        assert got is not None and got[0] == 1
        np.testing.assert_array_equal(np.asarray(got[1]["x"]), np.ones(4))

    @pytest.mark.slow  # CLI e2e run; also hits the known single-process
    # pytest degradation on this 2-CPU host when run late in a long session
    def test_cli_auto_resume(self, tmp_path):
        """Preemption flow: run 3 iters with elastic saves, then relaunch
        with --auto-resume — the second run continues instead of restarting
        (its stats record only the remaining iterations)."""
        from llm_qat_tpu.cli.main_sp import main

        common = ["--tiny", "--batch-size", "2", "--max-seq-length", "32",
                  "--grad-accum", "2", "--bit-widths", "4", "32",
                  "--output-dir", str(tmp_path), "--save-every", "1",
                  "--auto-resume"]
        main(["--num-iterations", "3"] + common)
        state, stats = main(["--num-iterations", "5"] + common)
        assert len(stats.iteration_losses) == 2  # resumed at iter 3
        assert int(state.step) == 5
