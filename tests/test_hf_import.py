"""HF GPT-2 import parity: our 32-bit forward must match transformers' GPT-2.

Validates the Conv1D-layout handling (the reference transposes for torch
nn.Linear, `models_sp.py:359-377`; we keep (in, out) — see hf_import.py) and
LN bank replication, end-to-end against torch GPT2LMHeadModel on random
weights (offline — no hub download)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llm_qat_tpu.models import (
    GPT2Config,
    QuantConfig,
    SPModelConfig,
    init_sp_params,
    prec_tables,
    sp_forward,
)
from llm_qat_tpu.models.hf_import import load_hf_gpt2


@pytest.fixture(scope="module")
def pair():
    hf_cfg = transformers.GPT2Config(
        vocab_size=128,
        n_positions=32,
        n_embd=48,
        n_layer=2,
        n_head=3,
        activation_function="gelu",  # exact erf gelu == our forward (ref nn.GELU)
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.GPT2LMHeadModel(hf_cfg).eval()

    cfg = SPModelConfig(
        model=GPT2Config(vocab_size=128, n_positions=32, n_embd=48, n_layer=2, n_head=3),
        quant=QuantConfig(bit_widths=(8, 32),
                          lora_rank_per_bit={8: 4, 32: 0},
                          lora_alpha_per_bit={8: 8, 32: 0}),
    )
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    params = load_hf_gpt2(params, cfg, hf)
    return hf, cfg, params


class TestHFParity:
    def test_logits_match(self, pair):
        hf, cfg, params = pair
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 128, (2, 16))
        with torch.no_grad():
            want = hf(torch.tensor(ids)).logits.numpy()
        got = np.asarray(
            sp_forward(params, jnp.asarray(ids), cfg.quant.prec_index(32), cfg)["logits"]
        )
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_loss_matches(self, pair):
        hf, cfg, params = pair
        rng = np.random.default_rng(1)
        ids = rng.integers(0, 128, (1, 12))
        with torch.no_grad():
            want = float(hf(torch.tensor(ids), labels=torch.tensor(ids)).loss)
        got = float(
            sp_forward(params, jnp.asarray(ids), cfg.quant.prec_index(32), cfg,
                       labels=jnp.asarray(ids))["loss"]
        )
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_ln_banks_replicated(self, pair):
        hf, cfg, params = pair
        g = np.asarray(params["blocks"]["ln1"]["g"])  # (L, P, d)
        assert g.shape[1] == cfg.quant.n_prec
        np.testing.assert_array_equal(g[:, 0], g[:, 1])
        want = hf.transformer.h[0].ln_1.weight.detach().numpy()
        np.testing.assert_allclose(g[0, 0], want, rtol=1e-6)


class TestCheckPretrainedInit:
    def test_report_matches_after_import(self, pair):
        from llm_qat_tpu.cli.check_init import compare_with_pretrained

        hf, cfg, params = pair
        report = compare_with_pretrained(params, hf.state_dict())
        assert report["summary"]["initialized_from_pretrained"]
        assert report["summary"]["n_mismatch"] == 0

    def test_detects_divergence(self, pair):
        from llm_qat_tpu.cli.check_init import compare_with_pretrained
        import jax.numpy as jnp

        hf, cfg, params = pair
        p2 = dict(params)
        p2["wte"] = params["wte"] + 1.0
        report = compare_with_pretrained(p2, hf.state_dict())
        assert not report["summary"]["initialized_from_pretrained"]
        assert any(m[0] == "wte" for m in report["mismatches"])
