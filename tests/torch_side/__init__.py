"""Torch-side oracle builders for the frozen parity fixtures.

Everything under this package imports torch and the reference sources
(/root/reference via tests/ref_oracle.py). It is imported ONLY from inside
``oracle_cache.oracle`` builder closures, so the test suite itself runs
torch-free once the fixtures under tests/fixtures/ exist. Regenerate with
``MPA_REGEN_ORACLES=1 python -m pytest tests/``.
"""
