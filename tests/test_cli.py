"""CLI entry-point smoke tests (tiny configs, synthetic data) — the reference
entry points are exercised only manually; these keep ours runnable."""

import json
import sys

import numpy as np
import pytest


class TestMainSP:
    def test_tiny_training_run(self, tmp_path):
        from llm_qat_tpu.cli.main_sp import main

        state, stats = main([
            "--tiny", "--num-iterations", "3", "--batch-size", "2",
            "--max-seq-length", "32", "--grad-accum", "2",
            "--eval-interval", "2",
            "--bit-widths", "4", "32",
            "--output-dir", str(tmp_path),
        ])
        assert len(stats.iteration_losses) == 3
        assert (tmp_path / "sp_4bit.npz").exists()
        stats_files = list(tmp_path.glob("training_stats_*.json"))
        assert stats_files
        data = json.loads(stats_files[0].read_text())
        assert len(data["iteration_losses"]) == 3
        assert data["model_config"]["model"]["n_layer"] == 2

    def test_resume_from_checkpoint(self, tmp_path):
        from llm_qat_tpu.cli.main_sp import main

        main(["--tiny", "--num-iterations", "1", "--batch-size", "2",
              "--max-seq-length", "32", "--grad-accum", "2",
              "--bit-widths", "4", "32", "--output-dir", str(tmp_path)])
        state, _ = main([
            "--tiny", "--num-iterations", "1", "--batch-size", "2",
            "--max-seq-length", "32", "--grad-accum", "2",
            "--bit-widths", "4", "32", "--output-dir", str(tmp_path / "b"),
            "--checkpoint", str(tmp_path / "sp_4bit.npz"),
        ])
        assert state is not None


class TestMainCPT:
    def test_tiny_cpt_run(self, tmp_path):
        from llm_qat_tpu.cli.main_cpt import main

        state, stats = main([
            "--tiny", "--total-epochs", "3", "--total-cycles", "1",
            "--batch-size", "2", "--target-bits", "5", "--skip-prt",
            "--output-dir", str(tmp_path),
        ])
        assert (tmp_path / "cpt_target_5bit.npz").exists()
        assert len(stats.iteration_losses) == 3


class TestEvalSP:
    def test_eval_checkpoint(self, tmp_path):
        from llm_qat_tpu.cli.main_sp import main as train_main
        from llm_qat_tpu.cli.eval_sp import main as eval_main

        train_main(["--tiny", "--num-iterations", "1", "--batch-size", "2",
                    "--max-seq-length", "32", "--grad-accum", "2",
                    "--bit-widths", "4", "32", "--output-dir", str(tmp_path)])
        results = eval_main([
            "--model-path", str(tmp_path / "sp_4bit.npz"),
            "--output-dir", str(tmp_path / "eval"),
            "--max-length", "32", "--stride", "32",
        ])
        assert results["bit_width"] == 4
        assert "wikitext2" in results["perplexity"]
        assert (tmp_path / "eval" / "results.json").exists()

    def test_per_tensor_eval_mode(self, tmp_path):
        from llm_qat_tpu.cli.main_sp import main as train_main
        from llm_qat_tpu.cli.eval_sp import main as eval_main

        train_main(["--tiny", "--num-iterations", "1", "--batch-size", "2",
                    "--max-seq-length", "32", "--grad-accum", "2",
                    "--bit-widths", "4", "32", "--output-dir", str(tmp_path)])
        results = eval_main([
            "--model-path", str(tmp_path / "sp_4bit.npz"),
            "--output-dir", str(tmp_path / "eval_pt"), "--per-tensor",
            "--max-length", "32", "--stride", "32",
        ])
        assert np.isfinite(results["perplexity"]["wikitext2"])


class TestMainSquad:
    def test_tiny_squad_run(self, tmp_path):
        from llm_qat_tpu.cli.main_squad import main

        results = main([
            "--tiny", "--num-iterations", "2", "--batch-size", "2",
            "--bit-widths", "4", "32",
            "--output-dir", str(tmp_path),
        ])
        assert 32 in results
        assert "f1" in results[32]
        assert (tmp_path / "squad_results.json").exists()


class TestRunRPI:
    def test_tiny_rpi(self, tmp_path):
        from llm_qat_tpu.cli.run_rpi import main

        report = main([
            "--tiny", "--num-samples", "2",
            "--switch-probs", "0.0", "0.5",
            "--bit-widths", "4", "32",
            "--output-dir", str(tmp_path),
        ])
        assert "clean" in report and "defense" in report
        assert (tmp_path / "rpi_report.json").exists()


class TestEvalCPT:
    def test_eval_cpt_with_emergency_recalibration(self, tmp_path):
        from llm_qat_tpu.cli.main_cpt import main as cpt_main
        from llm_qat_tpu.cli.eval_cpt import main as eval_main

        cpt_main(["--tiny", "--total-epochs", "2", "--total-cycles", "1",
                  "--batch-size", "2", "--target-bits", "5", "--skip-prt",
                  "--output-dir", str(tmp_path)])
        # eval at a bit-width that was never calibrated during training →
        # exercises the emergency-recalibration path (load_cpt_model.py:140-166)
        results = eval_main([
            "--model-path", str(tmp_path / "cpt_target_5bit.npz"),
            "--output-dir", str(tmp_path / "eval"),
            "--bits", "7", "--max-length", "32", "--stride", "32",
        ])
        assert results["bit_width"] == 7
        import numpy as np
        assert np.isfinite(results["perplexity"]["wikitext2"])
