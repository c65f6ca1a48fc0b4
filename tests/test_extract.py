"""HTML extraction: determinism, entity handling, and oracle sanity."""

from word2doc_spark.functions.extract import extract_text, is_dropped_title
from word2doc_spark.sources.pages import synthetic_pages_rows


def test_extract_basic():
    html = (b"<html><head><title>T</title><script>x<1</script></head>"
            b"<body><h1>Caf&eacute;</h1><p>hello &amp; world</p>"
            b"<!-- hidden --><div>bye</div></body></html>")
    text = extract_text(html)
    assert "Café" in text
    assert "hello & world" in text
    assert "hidden" not in text
    assert "x<1" not in text


def test_extract_none_and_empty():
    assert extract_text(None) is None
    assert extract_text(b"") is None
    assert extract_text(b"<p>   </p>") is None


def test_extract_deterministic():
    rows = synthetic_pages_rows(50, seed=42)
    for url, _, html, _, _ in rows:
        assert extract_text(html) == extract_text(html)
        out = extract_text(html)
        assert out  # every synthetic page extracts to non-empty text
        assert out == out.strip()


def test_title_filters():
    assert is_dropped_title("Foo (disambiguation)")
    assert is_dropped_title("Foo (disambiguation page)")
    assert is_dropped_title("List of rivers")
    assert is_dropped_title("Index of articles")
    assert is_dropped_title("Outline of physics")
    assert not is_dropped_title("Listed buildings")
    assert not is_dropped_title("Normal title")


def test_synthetic_rows_deterministic():
    a = synthetic_pages_rows(30, seed=42)
    b = synthetic_pages_rows(30, seed=42)
    assert a == b
    urls = [r[0] for r in a]
    assert len(set(urls)) == 30


def test_preprocess_plugin(spark):
    """I1: user plugin doc->doc|None applied post-extraction (drop + mutate)."""
    from word2doc_spark.index.analyze import extracted_docs
    from word2doc_spark.sources.pages import synthetic_pages

    def plugin(doc):
        if "disambiguation" in doc["text"].lower():
            return None  # drop
        return {"url": doc["url"], "text": doc["text"].upper()}

    pages = synthetic_pages(spark, 50, num_partitions=3)
    base = {r["url"]: r["text"] for r in extracted_docs(pages).collect()}
    got = {r["url"]: r["text"]
           for r in extracted_docs(pages, preprocess=plugin).collect()}
    dropped = {u for u, t in base.items() if "disambiguation" in t.lower()}
    assert dropped  # fixture plants disambiguation titles
    assert set(got) == set(base) - dropped
    for u, t in got.items():
        assert t == base[u].upper()
