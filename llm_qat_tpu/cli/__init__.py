"""CLI entry points (reference SURVEY.md §L6).

- `python -m llm_qat_tpu.cli.main_sp` — SP training (part1)
- `python -m llm_qat_tpu.cli.main_cpt` — cyclic precision training (part2)
- `python -m llm_qat_tpu.cli.eval_sp` — SP evaluation (part3)
- `python -m llm_qat_tpu.cli.main_squad` — SQuAD QA training (part5)
- `python -m llm_qat_tpu.cli.run_rpi` — random-precision defense eval (part4)
"""
