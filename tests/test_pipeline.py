"""End-to-end pipeline tests: Ray output ≡ serial oracle bytes under any
partitioning, resumability, and metric rollup (FIXTURES.md §5)."""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

from latyas_ray import EXTRACTOR_VERSION
from latyas_ray.corpus import generate_corpus, make_row
from latyas_ray.extract import extract_one
from latyas_ray.pipelines.extract_pipeline import (
    extract_dataset,
    list_corpus_files,
    read_pages,
    rollup_metrics,
    run_resumable,
)
from latyas_ray.state.lineage import completed_partitions, partition_input_files

N_ROWS = 96
N_SHARDS = 8


@pytest.fixture(scope="session")
def corpus_dir(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    generate_corpus(d, N_ROWS, n_shards=N_SHARDS)
    return d


@pytest.fixture(scope="session")
def golden(corpus_dir):
    """Serial oracle over the same rows: url → (extracted_text, checksum,
    final_text)."""
    out = {}
    for d in range(N_ROWS):
        row = make_row(d)
        res = extract_one(row["url"], row["html"], row["text"], row["lang"])
        out[row["url"]] = res
    return out


def _collect(ds):
    t = ds.to_pandas()
    return {r.url: r for r in t.itertuples()}


def test_corpus_shards_on_disk(corpus_dir):
    files = list_corpus_files(corpus_dir)
    assert len(files) == N_SHARDS
    total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert total == N_ROWS


def test_pipeline_matches_oracle_bytes(ray_session, corpus_dir, golden):
    ds = extract_dataset(read_pages(corpus_dir), batch_size=16, use_actors=False)
    got = _collect(ds)
    assert len(got) == N_ROWS
    for url, res in golden.items():
        assert got[url].extracted_text == res["extracted_text"], url
        assert got[url].checksum == res["checksum"], url
        assert got[url].final_text == res["final_text"], url
        assert got[url].text_source == res["text_source"], url


def test_pipeline_distribution_invariance(ray_session, corpus_dir, golden):
    """Byte-identical output across batch sizes and stage shapes."""
    for kwargs in (
        {"batch_size": 4, "use_actors": False},
        {"batch_size": 64, "use_actors": True, "concurrency": (1, 2)},
        {"batch_size": 16, "use_actors": False, "split_stages": True},
    ):
        ds = extract_dataset(read_pages(corpus_dir), **kwargs)
        got = _collect(ds)
        assert len(got) == N_ROWS, kwargs
        for url, res in golden.items():
            assert got[url].extracted_text == res["extracted_text"], (url, kwargs)


def test_resumable_run_and_kill_resume(ray_session, corpus_dir, golden, tmp_path):
    out_dir = str(tmp_path / "out")

    # simulate preemption: only 3 partitions complete, then the job dies
    r1 = run_resumable(corpus_dir, out_dir, n_partitions=N_SHARDS,
                       use_actors=False, max_partitions=3)
    assert r1["processed"] == [0, 1, 2] and not r1["complete"]
    done = completed_partitions(out_dir, EXTRACTOR_VERSION)
    assert set(done) == {0, 1, 2}
    mtimes_before = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(out_dir, "part-*", "*.parquet"))
    }

    # resume: completed partitions untouched, the rest processed
    r2 = run_resumable(corpus_dir, out_dir, n_partitions=N_SHARDS, use_actors=False)
    assert r2["skipped"] == [0, 1, 2]
    assert r2["complete"]
    for f, mt in mtimes_before.items():
        assert os.path.getmtime(f) == mt, f"completed partition rewritten: {f}"

    # final union is byte-identical to the oracle
    files = sorted(glob.glob(os.path.join(out_dir, "part-*", "*.parquet")))
    seen = {}
    for f in files:
        t = pq.read_table(f, columns=["url", "extracted_text", "checksum"])
        for url, text, ck in zip(*(t.column(c).to_pylist() for c in ("url", "extracted_text", "checksum"))):
            seen[url] = (text, ck)
    assert len(seen) == N_ROWS
    for url, res in golden.items():
        assert seen[url] == (res["extracted_text"], res["checksum"]), url

    # lineage records carry version + checksum + inputs
    rec = done[0]
    assert rec.extractor_version == EXTRACTOR_VERSION
    assert rec.n_rows > 0 and len(rec.checksum_xor) == 16
    assert rec.input_files == [os.path.basename(p) for p in
                               partition_input_files(list_corpus_files(corpus_dir), N_SHARDS)[0]]

    # metrics rollup — the only groupby, post-write
    m = rollup_metrics(out_dir)
    assert m["n_docs"].sum() == N_ROWS
    assert os.path.exists(os.path.join(out_dir, "metrics.json"))
    with open(os.path.join(out_dir, "metrics.json")) as f:
        assert sum(r["n_docs"] for r in json.load(f)) == N_ROWS


def test_job_submit_entrypoint(corpus_dir, tmp_path):
    """The `ray job submit` entrypoint (jobs/extract_job.py, the north
    rule's cluster launcher) end-to-end in a subprocess — its own Ray
    session, exactly as a job driver gets one: first submission completes
    all partitions (exit 0, metrics.json written), a re-submission with
    the same arguments skips every completed partition (the preemption
    re-submit story the module docstring promises)."""
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = str(tmp_path / "job_out")
    cmd = [_sys.executable, os.path.join(repo, "jobs", "extract_job.py"),
           "--in", corpus_dir, "--out", out_dir,
           "--partitions", "4", "--no-actors"]

    def run():
        p = subprocess.run(cmd, cwd=repo, capture_output=True, text=True,
                           timeout=600)
        lines = [l for l in p.stdout.splitlines()
                 if l.startswith('{"job"')]
        assert p.returncode == 0, p.stderr[-2000:]
        assert lines, p.stdout[-2000:]
        return json.loads(lines[0])

    r1 = run()
    assert r1["complete"] and r1["n_processed"] == 4 and r1["n_skipped"] == 0
    with open(os.path.join(out_dir, "metrics.json")) as f:
        assert sum(r["n_docs"] for r in json.load(f)) == N_ROWS

    r2 = run()  # re-submit after "preemption": everything already done
    assert r2["complete"] and r2["n_processed"] == 0 and r2["n_skipped"] == 4


def test_stale_version_reprocessed(ray_session, corpus_dir, tmp_path):
    out_dir = str(tmp_path / "out2")
    run_resumable(corpus_dir, out_dir, n_partitions=4, use_actors=False,
                  max_partitions=1)
    # tamper: pretend partition 0 was written by an older extractor
    lin = os.path.join(out_dir, "_lineage", "part-00000.json")
    with open(lin) as f:
        rec = json.load(f)
    rec["extractor_version"] = "latyas-ray-extractor/0"
    with open(lin, "w") as f:
        json.dump(rec, f)
    r = run_resumable(corpus_dir, out_dir, n_partitions=4, use_actors=False)
    assert 0 in r["processed"]  # stale version → redone


def test_export_labelme_sink(ray_session, corpus_dir, tmp_path):
    import glob as g
    import json as j

    from latyas_ray.pipelines.extract_pipeline import export_labelme

    ds = extract_dataset(read_pages(corpus_dir), batch_size=32, use_actors=False)
    out = str(tmp_path / "labelme")
    export_labelme(ds, out)
    files = g.glob(os.path.join(out, "*.json"))
    assert files
    rows = [j.loads(line) for f in files for line in open(f) if line.strip()]
    assert len(rows) == N_ROWS
    row = next(r for r in rows if j.loads(r["shapes"]))
    shape = j.loads(row["shapes"])[0]
    assert shape["shape_type"] == "rectangle" and len(shape["points"]) == 2


def test_split_stages_routes_binary_pdfs_without_string_cast(ray_session):
    """The split-stage routing mask must (a) send REAL %PDF-1.x rows to
    the PDF branch, (b) survive non-UTF-8 payloads (a string cast would
    raise ArrowInvalid and kill the batch), (c) keep null-html rows on
    the HTML branch instead of dropping them."""
    import pyarrow as pa
    import ray.data as rd

    from latyas_ray.pdf_real import write_pdf

    real_pdf = write_pdf(
        [{"w": 612.0, "h": 792.0, "runs": [(72.0, 100.0, 11.0, "body line")]}]
    )
    rows = pa.table(
        {
            "url": ["u-real", "u-corrupt", "u-html", "u-null"],
            "warc_ts": pa.array([0, 0, 0, 0], pa.timestamp("us")),
            "html": pa.array(
                [real_pdf, b"%PDF-1.4\n" + b"\xff\xfe" * 50,
                 b"<html><body><main><p>hi</p></main></body></html>", None],
                pa.binary(),
            ),
            "text": pa.array([None, None, None, None], pa.string()),
            "lang": pa.array(["en"] * 4, pa.string()),
        }
    )
    ds = extract_dataset(rd.from_arrow(rows), batch_size=4,
                         use_actors=False, split_stages=True)
    got = {r["url"]: r for r in ds.take_all()}
    assert len(got) == 4  # null row not dropped
    assert got["u-real"]["payload_kind"] == "pdf"
    assert "body line" in got["u-real"]["extracted_text"]
    assert got["u-corrupt"]["payload_kind"] == "pdf"  # dead-letter or empty
    assert got["u-html"]["extracted_text"] == "hi"
    assert got["u-null"]["payload_kind"] == "html"


def _preset_fixture_payload() -> bytes:
    """One synthetic PDF page exercising every rule family the presets
    differ on: text kinds, an equation, a table, a reference, a header."""
    page = {
        "w": 612.0, "h": 792.0,
        "blocks": [
            {"label": "title", "conf": 0.95, "bbox": [50, 40, 560, 70],
             "text": "A Title"},
            {"label": "plain text", "conf": 0.9, "bbox": [50, 90, 560, 200],
             "text": "Body paragraph one."},
            {"label": "figure_caption", "conf": 0.9, "bbox": [50, 220, 560, 240],
             "text": "Figure 9: unrelated caption."},
            {"label": "table", "conf": 0.9, "bbox": [50, 260, 560, 360],
             "text": "a,b\n1,2"},
            {"label": "equation", "conf": 0.9, "bbox": [50, 380, 560, 420],
             "text": "E = mc^2"},
            {"label": "reference", "conf": 0.9, "bbox": [50, 440, 560, 520],
             "text": "[1] Someone 2020."},
            {"label": "header", "conf": 0.9, "bbox": [50, 10, 560, 25],
             "text": "running head"},
        ],
    }
    return b"%PDF-SYN\n" + json.dumps({"pages": [page]}).encode()


def test_named_presets_reference_parity():
    """The three named presets (pipelines/presets.py) mirror the
    reference configs: paper's 12-rule table recognizes
    equation/table/reference kinds that report/book drop (rule-less →
    no text, pdf2text.py:31-33), and report ≡ book is PINNED — the
    reference's ReportPipeline (report_pipeline.py:13-25) and
    BookPipeline (book_pipeline.py:12-24) are identical configs
    differing only in class name.  All outputs deterministic (two runs
    byte-identical)."""
    from latyas_ray.pipelines.presets import BOOK, PAPER, REPORT, get_preset

    payload = _preset_fixture_payload()

    def run(preset):
        return extract_one("u-p", payload,
                           ocr_registry=preset.build_registry())

    paper1, paper2 = run(PAPER), run(PAPER)
    report, book = run(REPORT), run(BOOK)

    assert paper1 == paper2  # deterministic
    assert report == run(REPORT)

    # paper: full rule table -> table/equation/reference text present,
    # the equation $$-wrapped exactly as the writer does
    assert "A Title" in paper1["extracted_text"]
    assert "a,b\n1,2" in paper1["extracted_text"]
    assert "$$\nE = mc^2\n$$" in paper1["extracted_text"]
    assert "[1] Someone 2020." in paper1["extracted_text"]
    # header is textual but boilerplate: never assembled (KEEP_KINDS)
    assert "running head" not in paper1["extracted_text"]

    # report/book: only Title/Text/Caption rules -> the rest contribute
    # no text; the two presets are the SAME config under different names
    assert report == book
    assert REPORT.rules == BOOK.rules
    assert REPORT.layout_models == BOOK.layout_models
    assert "A Title" in report["extracted_text"]
    assert "Body paragraph one." in report["extracted_text"]
    for gone in ("a,b", "E = mc^2", "[1] Someone", "running head"):
        assert gone not in report["extracted_text"]
    assert report["extracted_text"] != paper1["extracted_text"]

    # region inventory is the detector's business, not the rule table's:
    # all presets detect the same regions
    assert len(paper1["regions"]) == len(report["regions"])

    assert get_preset("paper") is PAPER
    import pytest as _pytest
    with _pytest.raises(KeyError):
        get_preset("magazine")


def test_preset_threads_through_ray_pipeline(ray_session, tmp_path):
    """extract_dataset(preset=...) reaches the PdfExtractStage actor pool:
    the report preset's narrow rule table visibly changes the distributed
    output for a PDF row, and HTML rows are untouched."""
    import pyarrow as pa
    import ray.data as rd

    pdf = _preset_fixture_payload()
    tbl = pa.table(
        {"url": ["u-pdf", "u-html"],
         "warc_ts": [0, 0],
         "html": [pdf, b"<html><body><p>hi</p></body></html>"],
         "text": ["", ""],
         "lang": ["en", "en"]}
    )
    path = os.path.join(tmp_path, "pages-00000.parquet")
    pq.write_table(tbl, path)

    def run(**kw):
        out = extract_dataset(read_pages([path]), batch_size=8, **kw).to_pandas()
        return out.set_index("url")["extracted_text"].to_dict()

    default, report = run(), run(preset="report")
    assert "a,b\n1,2" in default["u-pdf"]
    assert "a,b" not in report["u-pdf"]
    assert "A Title" in report["u-pdf"]
    assert default["u-html"] == report["u-html"]

    with pytest.raises(ValueError):
        extract_dataset(read_pages([path]), preset="report", use_actors=False)


def test_lineage_preset_identity(tmp_path):
    """Resume identity includes the preset: a resumed run under a
    DIFFERENT preset must reprocess, or out_dir silently mixes outputs
    from two rule tables.  Old records without a preset field load as
    the default ('') — backward compatible."""
    from latyas_ray.state.lineage import (
        LineageRecord,
        completed_partitions,
        write_lineage,
    )

    rec = LineageRecord(pid=0, input_files=["a"], n_rows=1,
                        checksum_xor="0" * 16, extractor_version="v1",
                        preset="report")
    write_lineage(str(tmp_path), rec)
    os.makedirs(tmp_path / "part-00000")
    assert 0 in completed_partitions(str(tmp_path), "v1", preset="report")
    assert not completed_partitions(str(tmp_path), "v1")
    assert not completed_partitions(str(tmp_path), "v1", preset="paper")

    # legacy record without the field -> default preset matches
    import json as _json
    p = tmp_path / "_lineage" / "part-00000.json"
    d = _json.loads(p.read_text())
    del d["preset"]
    p.write_text(_json.dumps(d))
    assert 0 in completed_partitions(str(tmp_path), "v1")
    assert not completed_partitions(str(tmp_path), "v1", preset="report")


def test_config_preset_resume_skips_completed(ray_session, corpus_dir, tmp_path):
    """Resume with a config-file preset (a PipelinePreset OBJECT, not a
    registry name): the first run's lineage records the preset's string
    resume id, and a rerun of the identical command skips every
    completed partition.  Regression: completed_partitions was handed
    the OBJECT and compared string == object, so a resumed --config run
    silently reprocessed everything; and lineage recorded only the NAME,
    so a config overriding slots under an unchanged name aliased the
    base preset."""
    import dataclasses

    from latyas_ray.pipelines.presets import REPORT, preset_resume_id

    custom = dataclasses.replace(REPORT, rules=tuple(REPORT.rules[:2]))
    out_dir = str(tmp_path / "out")
    r1 = run_resumable(corpus_dir, out_dir, n_partitions=4, preset=custom)
    assert r1["complete"] and len(r1["processed"]) == 4
    recs = completed_partitions(
        out_dir, EXTRACTOR_VERSION, preset=preset_resume_id(custom)
    )
    assert set(recs) == {0, 1, 2, 3}

    r2 = run_resumable(corpus_dir, out_dir, n_partitions=4, preset=custom)
    assert r2["skipped"] == [0, 1, 2, 3] and not r2["processed"]

    # same NAME, different effective config (the base registry preset):
    # every partition must reprocess, not silently reuse the custom run
    r3 = run_resumable(corpus_dir, out_dir, n_partitions=4, preset="report")
    assert r3["processed"] == [0, 1, 2, 3] and not r3["skipped"]
