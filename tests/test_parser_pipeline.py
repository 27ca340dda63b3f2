"""Chunker + multi-format parse pipeline."""

import pytest

from dial_rag_tpu.documents.mime import detect_mime
from dial_rag_tpu.documents.parser import ParserConfig, parse_document
from dial_rag_tpu.errors import InvalidDocumentError
from dial_rag_tpu.text.chunker import Element, chunk_by_title
from tests.utils.pdf_builder import build_pdf


class TestChunker:
    def test_title_starts_new_chunk(self):
        els = [
            Element("Intro text."),
            Element("Heading", is_title=True),
            Element("Body under heading."),
        ]
        chunks = chunk_by_title(els)
        assert [c[0] for c in chunks] == [
            "Intro text.",
            "Heading\n\nBody under heading.",
        ]

    def test_max_characters(self):
        els = [Element("a" * 600), Element("b" * 600)]
        chunks = chunk_by_title(els, max_characters=1000)
        assert [len(c[0]) for c in chunks] == [600, 600]

    def test_oversized_element_split_on_words(self):
        text = " ".join(["word"] * 300)  # 1499 chars
        chunks = chunk_by_title([Element(text)], max_characters=1000)
        assert len(chunks) == 2
        assert all(len(c[0]) <= 1000 for c in chunks)
        assert " ".join(c[0] for c in chunks) == text

    def test_no_multipage_sections(self):
        els = [
            Element("Page one text", page_number=1),
            Element("Page two text", page_number=2),
        ]
        chunks = chunk_by_title(els)
        assert len(chunks) == 2
        assert chunks[0][1]["page_number"] == 1
        assert chunks[1][1]["page_number"] == 2

    def test_empty_elements_skipped(self):
        assert chunk_by_title([Element("  "), Element("")]) == []


class TestMimeDetection:
    def test_magic_wins(self):
        pdf = build_pdf([[(72, 720, 12, "x")]])
        assert detect_mime("text/plain", "doc.txt", pdf) == "application/pdf"

    def test_declared_type(self):
        assert detect_mime("text/html; charset=utf-8", None, b"<p>hi</p>") == "text/html"

    def test_extension_fallback(self):
        assert detect_mime(None, "notes.md", b"# hi") == "text/markdown"

    def test_plain_text_fallback(self):
        assert detect_mime(None, None, b"just words") == "text/plain"


class TestParsePdf:
    def test_chunks_with_pages_and_sources(self):
        pdf = build_pdf(
            [
                # realistic heading leading: an 18pt title sits >0.5x its
                # height above the body (the oracle-fitted gap rule)
                [(72, 720, 18, "Chapter One"), (72, 695, 11, "First chapter body.")],
                [(72, 720, 11, "Second page body.")],
            ]
        )
        chunks = parse_document(
            pdf,
            "application/pdf",
            source_link="files/bucket/doc.pdf",
            display_name="doc.pdf",
            attachment_mime_type="application/pdf",
        )
        assert [c.text for c in chunks] == [
            "Chapter One\n\nFirst chapter body.",
            "Second page body.",
        ]
        assert chunks[0].metadata["page_number"] == 1
        assert chunks[0].metadata["source"] == "files/bucket/doc.pdf#page=1"
        assert chunks[1].metadata["source"] == "files/bucket/doc.pdf#page=2"
        assert chunks[0].metadata["chunk_id"] == 0
        assert chunks[1].metadata["chunk_id"] == 1

    def test_image_only_page_gets_empty_chunk(self):
        pdf = build_pdf([[(72, 720, 11, "text page")], []])  # page 2 empty
        chunks = parse_document(
            pdf, "application/pdf", source_link="u", display_name="d"
        )
        assert len(chunks) == 2
        assert chunks[1].text == ""
        assert chunks[1].metadata["page_number"] == 2


class TestParseOtherFormats:
    def test_html(self):
        html = b"""<html><head><style>p{}</style></head><body>
        <h1>Main Title</h1><p>Paragraph one about alps.</p>
        <h2>Sub</h2><p>Paragraph two.</p>
        <script>ignore()</script></body></html>"""
        chunks = parse_document(html, "text/html", source_link="u")
        texts = [c.text for c in chunks]
        assert texts == [
            "Main Title\n\nParagraph one about alps.",
            "Sub\n\nParagraph two.",
        ]

    def test_plain_text(self):
        chunks = parse_document(
            b"para one\n\npara two", "text/plain", source_link="u"
        )
        assert [c.text for c in chunks] == ["para one\n\npara two"]

    def test_markdown_titles(self):
        md = b"# Title\n\nBody text.\n\n# Other\n\nMore."
        chunks = parse_document(md, "text/markdown", source_link="u")
        assert [c.text for c in chunks] == [
            "Title\n\nBody text.",
            "Other\n\nMore.",
        ]

    def test_csv(self):
        chunks = parse_document(
            b"name,age\nalice,30\nbob,25", "text/csv", source_link="u"
        )
        assert "alice 30" in chunks[0].text

    def test_image_document_single_empty_chunk(self):
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (10, 10), "red").save(buf, format="PNG")
        chunks = parse_document(buf.getvalue(), "image/png", source_link="u")
        assert len(chunks) == 1
        assert chunks[0].text == ""
        assert chunks[0].metadata["page_number"] == 1

    def test_unsupported_format(self):
        with pytest.raises(InvalidDocumentError):
            parse_document(b"\x00\x01", "application/zip", source_link="u")

    def test_empty_document(self):
        with pytest.raises(InvalidDocumentError, match="empty"):
            parse_document(b"", "text/plain", source_link="u")

    def test_text_size_cap(self):
        big = b"x" * 200
        with pytest.raises(InvalidDocumentError, match="too large"):
            parse_document(
                big,
                "text/plain",
                source_link="u",
                config=ParserConfig(max_document_text_size=100),
            )


def test_text_starting_with_bm_is_not_bmp():
    from dial_rag_tpu.documents.mime import detect_mime

    text = b"BMW sales report for 2026\nnumbers follow..."
    assert detect_mime("text/plain", "report.txt", text) == "text/plain"


def test_real_bmp_still_sniffed():
    import io as _io

    from PIL import Image

    from dial_rag_tpu.documents.mime import sniff_mime

    buf = _io.BytesIO()
    Image.new("RGB", (4, 4)).save(buf, format="BMP")
    assert sniff_mime(buf.getvalue()) == "image/bmp"


class TestHtmlOracleParity:
    """HTML segmentation vs chunk texts recorded in the reference's
    cached traffic for alps_wiki.html (mined like the PDF oracle; no
    exact-count golden exists for HTML in the reference, so this pins
    the measured floor: 10/24 recorded chunks byte-exact)."""

    def test_recorded_html_chunks(self):
        import json
        from pathlib import Path

        html_path = Path("/root/reference/tests/data/alps_wiki.html")
        fixture = (
            Path(__file__).parent / "data" / "alps_html_oracle_chunks.json"
        )
        if not html_path.is_file() or not fixture.is_file():
            import pytest

            pytest.skip("reference html corpus not mounted")
        oracle = json.load(open(fixture))
        chunks = parse_document(
            html_path.read_bytes(),
            "text/html",
            source_link="alps_wiki.html",
        )
        mine = {c.text for c in chunks}
        exact = sum(1 for t in oracle if t in mine)
        assert exact >= 10, exact

    def test_table_elements_isolated(self):
        html = (
            b"<html><body><p>Before the table.</p>"
            b"<table><tr><th>Name</th><th>Height</th></tr>"
            b"<tr><td>Mont Blanc</td><td>4810</td></tr></table>"
            b"<p>After the table.</p></body></html>"
        )
        chunks = parse_document(html, "text/html", source_link="t.html")
        texts = [c.text for c in chunks]
        assert "Name Height Mont Blanc 4810" in texts
        # the table chunk contains nothing but the table
        ti = texts.index("Name Height Mont Blanc 4810")
        assert "Before" in texts[ti - 1] and "After" in texts[ti + 1]

    def test_inline_markup_does_not_split_words(self):
        html = (
            b"<html><body><p>The Alps (<i>/\xc3\xa6lps/</i>; "
            b"<a href='x'>high</a> peaks).</p></body></html>"
        )
        chunks = parse_document(html, "text/html", source_link="t.html")
        assert chunks[0].text == "The Alps (/ælps/; high peaks)."
