"""CLI surface (reference main.py parity) — non-Ray subcommands; the
crawl/daemon paths are exercised through the engine tests (the CLI owns
a Ray session, so invoking them here would tear down the shared pytest
session)."""

from __future__ import annotations

import json
import os

from crawler_ray.__main__ import main


def test_gen_and_discover(tmp_path, capsys):
    out = str(tmp_path / "corpus")
    assert main(["gen", "--out", out, "--pages", "120", "--hosts", "1",
                 "--seed", "5"]) == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the plan budget is approximate (fixed pages + 85% posts + lists)
    assert info["n_plans"] >= 100
    assert os.path.exists(os.path.join(out, "pages"))
    assert os.path.exists(os.path.join(out, "robots.parquet"))

    pat_file = str(tmp_path / "patterns.json")
    assert main(["discover", "--corpus", out, "--out", pat_file]) == 0
    pats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # reference-parity eps merges same-host URL shapes coarsely; the CLI
    # just needs to produce host-rooted patterns and persist them
    assert pats and all(p["pattern"].startswith("https://site0.example/")
                        for p in pats)
    assert os.path.exists(pat_file)


def test_gen_idempotent(tmp_path, capsys):
    out = str(tmp_path / "corpus")
    assert main(["gen", "--out", out, "--pages", "60"]) == 0
    first = capsys.readouterr().out
    assert main(["gen", "--out", out, "--pages", "60"]) == 0
    second = capsys.readouterr().out
    assert json.loads(first.splitlines()[-1])["params"] \
        == json.loads(second.splitlines()[-1])["params"]


def test_curate_writes_and_resumes(tmp_path, capsys, ray_session):
    """curate writes one parquet directory per pass with a _SUCCESS
    marker; a rerun skips completed passes (resumable output); it must
    NOT shut down an already-running Ray session."""
    import pyarrow.dataset as pads
    import ray

    out = str(tmp_path / "curated")
    assert main(["curate", "--sf-dir", "/root/testdata/sf0.001",
                 "--out", out,
                 "--passes", "dataset_split,repetition_stats"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["passes"] == {"dataset_split": "written",
                             "repetition_stats": "written"}
    assert ray.is_initialized()  # the shared session survived
    n = pads.dataset(os.path.join(out, "dataset_split"),
                     format="parquet").count_rows()
    assert n == 500

    assert main(["curate", "--sf-dir", "/root/testdata/sf0.001",
                 "--out", out,
                 "--passes", "dataset_split,repetition_stats"]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert all(v.startswith("skipped") for v in rep2["passes"].values())

    # a crashed pass leaves files but no _SUCCESS; the rerun must clear
    # the partial directory before rewriting (write_parquet appends, so
    # skipping the clear would duplicate rows)
    split_dir = os.path.join(out, "dataset_split")
    os.remove(os.path.join(split_dir, "_SUCCESS"))
    assert main(["curate", "--sf-dir", "/root/testdata/sf0.001",
                 "--out", out, "--passes", "dataset_split"]) == 0
    rep3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep3["passes"] == {"dataset_split": "written"}
    assert pads.dataset(split_dir, format="parquet").count_rows() == 500


def test_curate_cli_fused_pipeline(tmp_path, capsys, ray_session):
    """The fused five-stage chain runs as a CLI pass with the same
    resumable parquet sink contract.  (Own fixture: the sf word-soup
    tables keep zero docs under the library's Gopher defaults.)"""
    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    sf = tmp_path / "sf"
    sf.mkdir()
    texts = [" ".join(f"w{d}x{i:03d}" for i in range(60))
             for d in range(8)]
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(sf / "documents.parquet"))

    out = str(tmp_path / "curated")
    assert main(["curate", "--sf-dir", str(sf),
                 "--out", out, "--passes", "curate_pipeline"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["passes"] == {"curate_pipeline": "written"}
    d = pads.dataset(os.path.join(out, "curate_pipeline"),
                     format="parquet")
    assert sorted(d.schema.names) == [
        "doc_id", "n_copies", "n_dropped", "n_lines", "n_words",
        "split", "text_hash"]


def test_curate_cli_zero_row_pass_is_readable(tmp_path, capsys,
                                              ray_session):
    """A pass whose result is empty (Gopher defaults keep zero docs of
    the sf word-soup) must still leave a READABLE parquet directory —
    a typed empty file, not a bare _SUCCESS marker."""
    import pyarrow.dataset as pads

    out = str(tmp_path / "curated")
    assert main(["curate", "--sf-dir", "/root/testdata/sf0.001",
                 "--out", out, "--passes", "curate_pipeline"]) == 0
    d = pads.dataset(os.path.join(out, "curate_pipeline"),
                     format="parquet")
    assert d.count_rows() == 0
    assert "doc_id" in d.schema.names and "split" in d.schema.names
