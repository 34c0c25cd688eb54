"""Smoke tests: the examples/ pipelines must keep running end to end.

They exercise operator composition (signals → filter → dedup → split →
mixture → pack → rollup; stream → enrich → aggregate → hand-off) that
the per-query oracle tests never chain together.
"""

from __future__ import annotations

import os
import sys

EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)
sys.path.insert(0, EXAMPLES)


def test_curation_pipeline_example(spark, sf_dir, capsys):
    import curation_pipeline

    curation_pipeline.main(sf_dir)
    out = capsys.readouterr().out
    assert "filter pass:" in out
    assert "span scrub:" in out
    assert "dedup pass:" in out
    assert "dedup method agreement" in out
    assert "per-source dedup yield loss" in out
    assert "embedding class separation" in out
    assert "mixture pass:" in out
    assert "packed into" in out


def test_end_to_end_example(spark, sf_dir, capsys):
    import end_to_end

    end_to_end.main(sf_dir)
    out = capsys.readouterr().out.lower()
    assert out.strip()  # produced its stage report
