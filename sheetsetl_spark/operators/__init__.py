"""Extension operators (SURVEY.md §2-C): LLM-data-pipeline primitives the
reference lacks, built as compositions of DataFrame ops (never row-Python
in the hot path) so Catalyst/Tungsten execute them at 100 TB scale.
"""
