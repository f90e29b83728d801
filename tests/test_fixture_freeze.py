"""Golden-fixture drift gate (FIXTURES.md §2.3): the committed parquet IS
the reference triple set; any change to synth.py or rules.py that shifts it
must be a conscious re-freeze (tools: regenerate via the snippet in the
fixture files' git history)."""

from __future__ import annotations

import pathlib

import pandas as pd

FIX = pathlib.Path(__file__).parent / "fixtures"


def test_expected_triples_frozen(corpus):
    frozen = pd.read_parquet(FIX / "expected_triples.parquet")
    live = corpus.expected_triples
    cols = ["subj", "pred", "obj", "conv_id", "turn_idx", "rule_id"]
    f = set(map(tuple, frozen[cols].itertuples(index=False)))
    l = set(map(tuple, live[cols].itertuples(index=False)))
    assert f == l, f"fixture drift: +{len(l - f)} -{len(f - l)}"


def test_expected_components_frozen(corpus):
    frozen = pd.read_parquet(FIX / "expected_components.parquet")
    live = corpus.expected_components
    assert set(map(tuple, frozen.itertuples(index=False))) == set(
        map(tuple, live.itertuples(index=False))
    )
