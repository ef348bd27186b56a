"""Operators: the reference's data-quality suite (SURVEY §2.10 Q1–Q6),
generic relational helpers, and LLM-data-pipeline extensions (§2.11).

Every operator takes and returns DataFrames (lazy plans). Quality ops
return **report DataFrames** rather than printing — the reference prints
(NB display()/show() everywhere, SURVEY §2.9 D3); presentation is the
caller's job.
"""

from . import (  # noqa: F401
    accuracy,
    completeness,
    consistency,
    dedup,
    multimodal,
    relational,
    sampling,
    sessions,
    similarity,
    temporal,
    text,
    timeliness,
    uniqueness,
    validity,
)
