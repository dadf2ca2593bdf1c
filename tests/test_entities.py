"""Expert/answer/link-table entity surface (reference
database/schema.py:48-102, core/storage.py:213-240) over a synthetic
content_items table with known expected outputs."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_ray.ops import entities

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def items_path(tmp_path_factory):
    rows = [
        # two profile pages for expert A (first-wins profile_url = a1),
        # one for expert B, one authorless profile (ignored)
        ("https://s/a1", "A", "profile", []),
        ("https://s/a2", "A", "profile", ["civil"]),
        ("https://s/b1", "B", "profile", []),
        ("https://s/x1", "", "profile", []),
        # answers: A answers 3 (2 civil, 1 criminal), B answers 1 (civil),
        # authorless answer ignored
        ("https://s/q1", "A", "answer", ["civil"]),
        ("https://s/q2", "A", "answer", ["civil", "criminal"]),
        ("https://s/q3", "A", "answer", []),
        ("https://s/q4", "B", "answer", ["civil"]),
        ("https://s/q5", "", "answer", ["civil"]),
        # other content types don't make experts or answers
        ("https://s/n1", "C", "article", ["commercial"]),
    ]
    t = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "author": pa.array([r[1] for r in rows], pa.string()),
        "content_type": pa.array([r[2] for r in rows], pa.string()),
        "domains_json": pa.array([json.dumps(r[3]) for r in rows],
                                 pa.string()),
        "similarity_hash": pa.array([f"h{i}" for i in range(len(rows))],
                                    pa.string()),
    })
    out = str(tmp_path_factory.mktemp("items"))
    pq.write_table(t, os.path.join(out, "items.parquet"))
    return out


def test_experts_table(items_path):
    df = (entities.experts_table(items_path).to_pandas()
          .set_index("name").sort_index())
    assert list(df.index) == ["A", "B"]
    assert df.loc["A", "profile_url"] == "https://s/a1"  # min url wins
    assert int(df.loc["A", "n_profiles"]) == 2
    assert int(df.loc["A", "answers_count"]) == 3
    assert int(df.loc["B", "answers_count"]) == 1


def test_experts_left_join_zero_answers(items_path):
    """An expert with a profile but no answers keeps answers_count=0
    (left join + fill, the reference's default column value)."""
    # expert C: article author only -> not an expert; add a profile-only
    # expert via a second table
    t = pq.read_table(os.path.join(items_path, "items.parquet"))
    extra = pa.table({
        "url": pa.array(["https://s/d1"], pa.string()),
        "author": pa.array(["D"], pa.string()),
        "content_type": pa.array(["profile"], pa.string()),
        "domains_json": pa.array(["[]"], pa.string()),
        "similarity_hash": pa.array(["hd"], pa.string()),
    })
    import tempfile
    d = tempfile.mkdtemp()
    pq.write_table(pa.concat_tables([t, extra]),
                   os.path.join(d, "items.parquet"))
    df = (entities.experts_table(d).to_pandas()
          .set_index("name"))
    assert int(df.loc["D", "answers_count"]) == 0


def test_answers_table(items_path):
    df = entities.answers_table(items_path).to_pandas()
    assert len(df) == 4
    assert set(df["expert_name"]) == {"A", "B"}


def test_domain_content_table(items_path):
    df = (entities.domain_content_table(items_path).to_pandas()
          .sort_values(["url", "domain"]).reset_index(drop=True))
    # a2: civil; q1: civil; q2: civil+criminal; q4: civil; q5: civil;
    # n1: commercial
    assert len(df) == 7
    assert (df["relevance_milli"] == 800).all()
    assert set(df[df["url"] == "https://s/q2"]["domain"]) == {
        "civil", "criminal"}


def test_expert_domain_table(items_path):
    df = (entities.expert_domain_table(items_path).to_pandas()
          .set_index(["expert_name", "domain"]).sort_index())
    # A's answer domains: civil x2, criminal x1 -> civil 666, criminal 333
    assert int(df.loc[("A", "civil"), "n_answers"]) == 2
    assert int(df.loc[("A", "civil"), "confidence_milli"]) == 666
    assert int(df.loc[("A", "criminal"), "confidence_milli"]) == 333
    assert int(df.loc[("B", "civil"), "confidence_milli"]) == 1000
