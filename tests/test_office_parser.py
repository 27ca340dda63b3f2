"""First-party OOXML/ODF extraction (documents/office.py)."""

import asyncio

import pytest

from dial_rag_tpu.documents.office import (
    MIME_DOCX,
    MIME_ODP,
    MIME_ODT,
    MIME_PPTX,
    docx_elements,
    odp_elements,
    odt_elements,
    office_elements,
    pptx_elements,
)
from dial_rag_tpu.documents.parser import parse_document
from dial_rag_tpu.errors import InvalidDocumentError
from tests.utils.office_builder import (
    build_docx,
    build_odp,
    build_odt,
    build_pptx,
)


def test_docx_paragraphs_and_headings():
    data = build_docx(
        [
            ("Introduction", "Heading1"),
            ("First paragraph of text.", None),
            ("Second paragraph.", None),
            ("Conclusion", "Heading2"),
            ("Final remarks.", None),
        ]
    )
    els = docx_elements(data)
    assert [e.text for e in els] == [
        "Introduction",
        "First paragraph of text.",
        "Second paragraph.",
        "Conclusion",
        "Final remarks.",
    ]
    assert [e.is_title for e in els] == [True, False, False, True, False]


def test_docx_table_rows():
    data = build_docx([("Name|Height", "table"), ("After table.", None)])
    els = docx_elements(data)
    assert els[0].text == "Name | Height"
    assert els[1].text == "After table."


def test_pptx_slides_pages_titles():
    data = build_pptx(
        [
            [("Slide One Title", True), ("Bullet A", False)],
            [("Slide Two Title", True), ("Bullet B", False)],
        ]
    )
    els = pptx_elements(data)
    assert [(e.text, e.page_number, e.is_title) for e in els] == [
        ("Slide One Title", 1, True),
        ("Bullet A", 1, False),
        ("Slide Two Title", 2, True),
        ("Bullet B", 2, False),
    ]


def test_odt_headings():
    data = build_odt([("Heading", True), ("Body text.", False)])
    els = odt_elements(data)
    assert [(e.text, e.is_title) for e in els] == [
        ("Heading", True),
        ("Body text.", False),
    ]


def test_odp_pages():
    data = build_odp([[("Title", True)], [("Content", False)]])
    els = odp_elements(data)
    assert [(e.text, e.page_number, e.is_title) for e in els] == [
        ("Title", 1, True),
        ("Content", 2, False),
    ]


def test_invalid_archive_rejected():
    with pytest.raises(InvalidDocumentError):
        office_elements(b"not a zip at all", MIME_DOCX)


def test_missing_content_part_rejected():
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.xml", "<x/>")
    with pytest.raises(InvalidDocumentError):
        office_elements(buf.getvalue(), MIME_DOCX)


def test_parse_document_docx_end_to_end():
    data = build_docx(
        [("Section", "Heading1")]
        + [(f"Sentence number {i} about mountains.", None) for i in range(30)]
    )
    chunks = parse_document(
        data, MIME_DOCX, source_link="doc.docx", display_name="doc.docx"
    )
    assert len(chunks) >= 2  # by-title chunking splits at 1000 chars
    assert chunks[0].text.startswith("Section")
    assert all(c.metadata["source"] == "doc.docx" for c in chunks)


def test_converter_falls_back_to_native(monkeypatch):
    from dial_rag_tpu.service import converter

    monkeypatch.setattr(converter, "soffice_available", lambda: False)

    class Sink:
        def __init__(self):
            self.text = ""

        def write(self, s):
            self.text += s

    sink = Sink()
    data = build_docx([("Hello", None)])
    mime, out = asyncio.run(
        converter.convert_document_if_needed(MIME_DOCX, data, sink)
    )
    assert mime == MIME_DOCX and out == data
    assert "native text extraction" in sink.text


def test_converter_still_errors_for_legacy_doc(monkeypatch):
    from dial_rag_tpu.service import converter

    monkeypatch.setattr(converter, "soffice_available", lambda: False)
    with pytest.raises(InvalidDocumentError):
        asyncio.run(
            converter.convert_document_if_needed(
                "application/msword", b"\xd0\xcf\x11\xe0", type(
                    "S", (), {"write": lambda self, s: None}
                )()
            )
        )


def test_xlsx_rows_and_sheet_titles():
    from dial_rag_tpu.documents.office import MIME_XLSX, xlsx_elements
    from tests.utils.office_builder import build_xlsx

    data = build_xlsx(
        {
            "Peaks": [["Name", "Height"], ["Zarvok", "4123"]],
            "Rivers": [["Quilmar", "Long"]],
        }
    )
    els = xlsx_elements(data)
    assert [(e.text, e.is_title) for e in els] == [
        ("Peaks", True),
        ("Name | Height", False),
        ("Zarvok | 4123", False),
        ("Rivers", True),
        ("Quilmar | Long", False),
    ]


def test_xlsx_parse_document_end_to_end():
    from dial_rag_tpu.documents.office import MIME_XLSX
    from tests.utils.office_builder import build_xlsx

    data = build_xlsx({"Data": [["alpha", "beta"], ["gamma", "delta"]]})
    chunks = parse_document(
        data, MIME_XLSX, source_link="t.xlsx", display_name="t.xlsx"
    )
    assert chunks and "alpha | beta" in chunks[0].text


def _rewrite_zip_member(data: bytes, name: str, payload: str) -> bytes:
    """Rebuild a zip with one member replaced (valid CRC, bad content)."""
    import io
    import zipfile

    src = zipfile.ZipFile(io.BytesIO(data))
    out = io.BytesIO()
    with zipfile.ZipFile(out, "w") as zf:
        for item in src.namelist():
            zf.writestr(item, payload if item == name else src.read(item))
    return out.getvalue()


@pytest.mark.parametrize(
    "part",
    [
        "xl/sharedStrings.xml",
        "xl/_rels/workbook.xml.rels",
        "xl/worksheets/sheet1.xml",
        "xl/workbook.xml",
    ],
)
def test_valid_zip_malformed_xml_is_invalid_document(part):
    """A structurally valid archive whose XML parts are garbage must be a
    400 (InvalidDocumentError), not a raw ElementTree.ParseError — byte
    fuzzing can't reach this because flips fail the zip CRC first."""
    from dial_rag_tpu.documents.office import MIME_XLSX
    from tests.utils.office_builder import build_xlsx

    base = build_xlsx({"S": [["a", "b"]]})
    data = _rewrite_zip_member(base, part, "<not </xml")
    with pytest.raises(InvalidDocumentError):
        office_elements(data, MIME_XLSX)


def test_valid_zip_malformed_docx_xml_is_invalid_document():
    data = _rewrite_zip_member(
        build_docx([("Body text.", None)]), "word/document.xml", "<a><b></a>"
    )
    with pytest.raises(InvalidDocumentError):
        office_elements(data, MIME_DOCX)


def test_xlsx_package_absolute_relationship_target():
    """Target="/xl/worksheets/sheet1.xml" is package-absolute per OPC and
    must resolve from the package root, not become xl/xl/..."""
    import re

    from dial_rag_tpu.documents.office import MIME_XLSX, xlsx_elements
    from tests.utils.office_builder import build_xlsx

    base = build_xlsx({"Peaks": [["Zarvok", "4123"]]})
    import io
    import zipfile

    src = zipfile.ZipFile(io.BytesIO(base))
    rels = src.read("xl/_rels/workbook.xml.rels").decode()
    rels = re.sub(
        r'Target="worksheets/', 'Target="/xl/worksheets/', rels
    )
    data = _rewrite_zip_member(base, "xl/_rels/workbook.xml.rels", rels)
    els = xlsx_elements(data)
    assert [(e.text, e.is_title) for e in els] == [
        ("Peaks", True),
        ("Zarvok | 4123", False),
    ]


def test_fuzzed_office_never_escapes_invalid_document_error():
    """Random mutations of valid office archives must parse or raise
    InvalidDocumentError — zip/zlib/xml internals must not leak."""
    import numpy as np

    from dial_rag_tpu.documents.office import MIME_XLSX
    from tests.utils.office_builder import build_xlsx

    rng = np.random.default_rng(3)
    cases = [
        (build_docx([("Head", "Heading1"), ("Body text.", None)]), MIME_DOCX),
        (build_pptx([[("Title", True)]]), MIME_PPTX),
        (build_xlsx({"S": [["a", "b"]]}), MIME_XLSX),
        (build_odt([("H", True)]), MIME_ODT),
    ]
    for base, mime in cases:
        base = bytearray(base)
        for trial in range(60):
            data = bytearray(base)
            for _ in range(int(rng.integers(1, 10))):
                data[int(rng.integers(0, len(data)))] = int(
                    rng.integers(0, 256)
                )
            try:
                parse_document(bytes(data), mime, source_link="f")
            except InvalidDocumentError:
                pass
