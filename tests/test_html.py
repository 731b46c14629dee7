"""DOM text-density boilerplate stripping (functions.html)."""

from __future__ import annotations

from readur_ray.functions.html import (
    MIN_BLOCK_CHARS,
    block_stats,
    extract_main_content,
    wrap_boilerplate,
)

MAIN = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo"


def test_nav_and_footer_dropped_main_kept():
    html = (
        "<html><body>"
        '<nav><a href="/a">Home</a> <a href="/b">About</a> <a href="/c">Contact page</a></nav>'
        f"<div><p>{MAIN}</p></div>"
        '<footer><p>Copyright links: <a href="/t">Terms of service</a> '
        '<a href="/p">Privacy policy page</a></p></footer>'
        "</body></html>"
    )
    assert extract_main_content(html) == MAIN


def test_link_dense_block_dropped_even_outside_nav():
    html = (
        f"<div><p>{MAIN}</p></div>"
        '<div><a href="/1">one link here</a> <a href="/2">two links here</a> '
        '<a href="/3">three links here</a></div>'
    )
    assert extract_main_content(html) == MAIN


def test_short_blocks_dropped():
    html = f"<p>tiny</p><p>{MAIN}</p><p>ok</p>"
    assert extract_main_content(html) == MAIN


def test_script_style_ignored():
    html = (
        "<script>var boilerplate_code_here = 'not content at all';</script>"
        "<style>p { margin: 0; padding: 12px; color: #333333; }</style>"
        f"<p>{MAIN}</p>"
    )
    assert extract_main_content(html) == MAIN


def test_multiple_content_blocks_joined():
    a = "first paragraph with enough characters to pass the gate"
    b = "second paragraph with enough characters to pass the gate"
    assert extract_main_content(f"<p>{a}</p><p>{b}</p>") == f"{a}\n\n{b}"


def test_wrap_roundtrip_and_stats():
    text = MAIN + " " + MAIN
    page = wrap_boilerplate(text, "k1")
    assert extract_main_content(page) == text
    kept, dropped = block_stats(page)
    assert kept == 1 and dropped >= 3  # header h1, nav, aside, footer


def test_below_threshold_yields_empty():
    short = "x" * (MIN_BLOCK_CHARS - 1)
    assert extract_main_content(wrap_boilerplate(short, "k")) == ""


def test_pipeline_html_class(ray_session, tmp_path):
    """html_page docs flow through the extraction DAG as html_text
    spans equal to the oracle's expectation."""
    import pyarrow.parquet as pq

    from readur_ray import synth
    from readur_ray.config import ExtractionConfig
    from readur_ray.oracle import expected_doc
    from readur_ray.pipelines.extract import build_extracted

    table = synth.make_corpus(120, seed=77, with_class=True)
    mask = [c == "html_page" for c in table.column("_cls").to_pylist()]
    assert any(mask), "corpus must contain html_page docs"
    corpus = str(tmp_path / "c")
    import os

    os.makedirs(corpus)
    pq.write_table(table.drop(["_cls"]), f"{corpus}/part-0.parquet")
    got = {}
    for b in build_extracted(corpus, ExtractionConfig()).iter_batches(
        batch_format="pyarrow"
    ):
        for row in b.to_pylist():
            got[row["doc_id"]] = row
    for doc, is_html in zip(table.to_pylist(), mask):
        if not is_html:
            continue
        exp = expected_doc({k: doc[k] for k in
                            ("doc_id", "spans", "mime_type", "file_size", "page_count")})
        g = got[doc["doc_id"]]
        assert g["status"] == exp["status"] == "completed"
        assert [s["kind"] for s in g["spans"]] == ["html_text"]
        assert [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in g["spans"]
        ] == [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in exp["spans"]
        ]
