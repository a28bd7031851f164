"""Fast smoke coverage of the CORE paths (VERDICT r3 weak #4).

Every model/kernel/parallel/serving test file carries the `slow` marker, so
the <2.5-min smoke tier (`-m 'not slow'`) previously exercised only
quant/evals/data/robustness — a regression in `sp_model.py` or the engine
would sail through the gate. These are tiny-dim (d=32, L=2, T<=16) variants
of one load-bearing assertion per core module; the full-depth versions live
in the slow tier. NO `slow` marker here by design.
"""

import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.models import (
    init_sp_params, prec_tables, sp_forward, tiny_test_config,
)
from llm_qat_tpu.train import CalibrationManager


def _setup():
    cfg = tiny_test_config((4, 32))
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batches = [jnp.asarray(rng.integers(0, cfg.model.vocab_size, (2, 16)))]
    params = CalibrationManager(cfg, 1).calibrate_all_precisions(
        params, batches)
    return cfg, params, batches


def test_sp_forward_and_grad_both_precisions():
    """sp_model core: finite loss + nonzero LoRA grads at the quantized
    slot, quantization actually changes the logits vs the 32-bit slot."""
    cfg, params, batches = _setup()
    tables = prec_tables(cfg.quant)
    ids = batches[0]

    def loss(p, prec):
        return sp_forward(p, ids, prec, cfg, tables=tables,
                          labels=ids)["loss"]

    l4, g4 = jax.value_and_grad(loss)(params, jnp.int32(0))
    l32 = loss(params, jnp.int32(1))
    assert np.isfinite(float(l4)) and np.isfinite(float(l32))
    # B is zero-init, so A's grad vanishes at init (chain rule through B=0);
    # B's grad is the live signal
    gb = np.asarray(g4["blocks"]["c_attn"]["lora_B"])
    assert np.isfinite(gb).all() and np.abs(gb).sum() > 0
    out4 = sp_forward(params, ids, jnp.int32(0), cfg, tables=tables)["logits"]
    out32 = sp_forward(params, ids, jnp.int32(1), cfg, tables=tables)["logits"]
    assert float(jnp.max(jnp.abs(out4 - out32))) > 1e-4


def test_sp_train_step_updates_params():
    """sp_trainer core: one jitted multi-precision step runs, loss finite,
    trainable params move, frozen embeddings don't."""
    from llm_qat_tpu.models.config import TrainConfig
    from llm_qat_tpu.train.sp_trainer import make_sp_train_step

    cfg, params, batches = _setup()
    tcfg = TrainConfig(batch_size=2, max_seq_length=16, num_iterations=2,
                       gradient_accumulation_steps=2, eval_interval=100)
    init_state, train_step = make_sp_train_step(cfg, tcfg)
    state = init_state(params)
    state2, metrics = jax.jit(train_step)(
        state, batches[0], jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    moved = float(jnp.max(jnp.abs(
        state2.params["blocks"]["c_attn"]["lora_A"]
        - state.params["blocks"]["c_attn"]["lora_A"])))
    assert moved > 0
    np.testing.assert_array_equal(np.asarray(state2.params["wte"]),
                                  np.asarray(state.params["wte"]))


def test_engine_decode_matches_generate():
    """Serving core: InferenceEngine greedy decode token-equals the
    KV-cached `generate` path on the same tree (tiny dims, dense path)."""
    from llm_qat_tpu.models.generate import generate
    from llm_qat_tpu.models.inference import InferenceEngine

    cfg, params, _ = _setup()
    tables = prec_tables(cfg.quant)
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.integers(1, 200, (2, 5)))
    eng = InferenceEngine(params, cfg, bits=32, max_batch=2, max_len=32,
                          dtype=jnp.float32, kv_layout="dense")
    got = np.asarray(eng.generate(prompt, max_new_tokens=4,
                                  do_sample=False))
    want = np.asarray(generate(
        params, prompt, cfg.quant.prec_index(32), cfg, max_new_tokens=4,
        do_sample=False, tables=tables))
    np.testing.assert_array_equal(got, want)


def test_mega_decode_step_interpret_micro():
    """Megakernel core: one interpret-mode step at micro dims writes the
    cache row and produces finite hidden states (full parity suites are in
    the slow tier)."""
    from llm_qat_tpu.models import GPT2Config, QuantConfig, SPModelConfig
    from llm_qat_tpu.models.inference import quantize_for_inference
    from llm_qat_tpu.ops.mega_decode import mega_decode_step, pack_mega_weights
    from llm_qat_tpu.train.calibration_manager import (
        calibrate_weight_quantizers,
    )

    cfg = SPModelConfig(
        model=GPT2Config(vocab_size=64, n_positions=32, n_embd=128,
                         n_layer=1, n_head=2),
        quant=QuantConfig(bit_widths=(8, 32), quantizer_per_bit={8: "minmax"},
                          per_channel=False,
                          lora_rank_per_bit={8: 2, 32: 0},
                          lora_alpha_per_bit={8: 4, 32: 0}),
        compute_dtype="float32",
    )
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    params = calibrate_weight_quantizers(params, cfg)
    ip = quantize_for_inference(params, cfg, 8, dtype=jnp.float32,
                                weight_format="int8_xla")
    ip.pop("_static")
    mw = pack_mega_weights(ip, cfg)
    B, T, d = 2, 32, cfg.model.n_embd
    kc = jnp.zeros((1, B, T, d), jnp.float32)
    vc = jnp.zeros_like(kc)
    h = jnp.asarray(np.random.default_rng(2).normal(size=(B, d)), jnp.float32)
    h_out, kc, vc = mega_decode_step(
        h, mw, kc, vc, jnp.int32(0), n_head=2, head_dim=64, has_lora=True,
        act_dtype=jnp.float32, interpret=True)
    assert np.isfinite(np.asarray(h_out)).all()
    assert float(jnp.max(jnp.abs(h_out - h))) > 0  # layers did something
    assert float(jnp.max(jnp.abs(kc[0, :, 0]))) > 0  # row 0 appended
    assert float(jnp.max(jnp.abs(kc[0, :, 1:]))) == 0  # others untouched


def test_tp_sharded_forward_matches_single_device():
    """Parallel core: TP+DP pjit forward on the virtual 8-device mesh
    agrees with the unsharded forward."""
    from llm_qat_tpu.parallel.mesh import (
        batch_sharding, make_mesh, shard_params,
    )

    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    cfg, params, batches = _setup()
    tables = prec_tables(cfg.quant)
    ids = jnp.concatenate([batches[0], batches[0]], axis=0)  # B=4 for dp=2
    want = np.asarray(sp_forward(params, ids, 0, cfg, tables=tables)["logits"])
    mesh = make_mesh(n_data=2, n_model=4)
    sharded, _ = shard_params(params, mesh)
    ids_sh = jax.device_put(ids, batch_sharding(mesh))

    @jax.jit
    def fwd(p, i):
        return sp_forward(p, i, 0, cfg, tables=tables)["logits"]

    got = np.asarray(fwd(sharded, ids_sh))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
