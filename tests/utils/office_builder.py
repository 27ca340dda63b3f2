"""Minimal OOXML / ODF writers for tests (first-party, no fixtures)."""

import io
import zipfile

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_P = "http://schemas.openxmlformats.org/presentationml/2006/main"
_TEXT = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_OFFICE = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
_DRAW = "urn:oasis:names:tc:opendocument:xmlns:drawing:1.0"
_PRES = "urn:oasis:names:tc:opendocument:xmlns:presentation:1.0"


def _zip(parts: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in parts.items():
            zf.writestr(name, content)
    return buf.getvalue()


def build_docx(blocks: list[tuple[str, str | None]]) -> bytes:
    """blocks: (text, style) where style e.g. 'Heading1' or None.
    A text of the form 'cell1|cell2' with style='table' emits a table row."""
    body = []
    for text, style in blocks:
        if style == "table":
            cells = "".join(
                f"<w:tc><w:p><w:r><w:t>{c}</w:t></w:r></w:p></w:tc>"
                for c in text.split("|")
            )
            body.append(f"<w:tbl><w:tr>{cells}</w:tr></w:tbl>")
        else:
            ppr = (
                f'<w:pPr><w:pStyle w:val="{style}"/></w:pPr>' if style else ""
            )
            body.append(
                f"<w:p>{ppr}<w:r><w:t>{text}</w:t></w:r></w:p>"
            )
    doc = (
        f'<?xml version="1.0"?><w:document xmlns:w="{_W}">'
        f"<w:body>{''.join(body)}</w:body></w:document>"
    )
    return _zip(
        {
            "[Content_Types].xml": "<Types/>",
            "word/document.xml": doc,
        }
    )


def build_pptx(slides: list[list[tuple[str, bool]]]) -> bytes:
    """slides: per slide, list of (text, is_title)."""
    parts = {"[Content_Types].xml": "<Types/>"}
    for i, shapes in enumerate(slides, start=1):
        sps = []
        for text, is_title in shapes:
            ph = '<p:ph type="title"/>' if is_title else "<p:ph/>"
            sps.append(
                f"<p:sp><p:nvSpPr><p:nvPr>{ph}</p:nvPr></p:nvSpPr>"
                f"<p:txBody><a:p><a:r><a:t>{text}</a:t></a:r></a:p>"
                f"</p:txBody></p:sp>"
            )
        parts[f"ppt/slides/slide{i}.xml"] = (
            f'<?xml version="1.0"?>'
            f'<p:sld xmlns:p="{_P}" xmlns:a="{_A}">'
            f"<p:cSld><p:spTree>{''.join(sps)}</p:spTree></p:cSld></p:sld>"
        )
    return _zip(parts)


def build_odt(blocks: list[tuple[str, bool]]) -> bytes:
    body = "".join(
        (
            f'<text:h text:outline-level="1">{t}</text:h>'
            if is_title
            else f"<text:p>{t}</text:p>"
        )
        for t, is_title in blocks
    )
    content = (
        f'<?xml version="1.0"?>'
        f'<office:document-content xmlns:office="{_OFFICE}" '
        f'xmlns:text="{_TEXT}">'
        f"<office:body><office:text>{body}</office:text></office:body>"
        f"</office:document-content>"
    )
    return _zip({"content.xml": content, "mimetype": "application/vnd.oasis.opendocument.text"})


def build_odp(slides: list[list[tuple[str, bool]]]) -> bytes:
    pages = []
    for shapes in slides:
        frames = "".join(
            f'<draw:frame presentation:class="{"title" if is_title else "outline"}">'
            f"<draw:text-box><text:p>{t}</text:p></draw:text-box></draw:frame>"
            for t, is_title in shapes
        )
        pages.append(f"<draw:page>{frames}</draw:page>")
    content = (
        f'<?xml version="1.0"?>'
        f'<office:document-content xmlns:office="{_OFFICE}" '
        f'xmlns:text="{_TEXT}" xmlns:draw="{_DRAW}" '
        f'xmlns:presentation="{_PRES}">'
        f"<office:body><office:presentation>{''.join(pages)}"
        f"</office:presentation></office:body></office:document-content>"
    )
    return _zip({"content.xml": content})


_S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKG = "http://schemas.openxmlformats.org/package/2006/relationships"


def build_xlsx(sheets: dict[str, list[list[str]]]) -> bytes:
    """sheets: {sheet name: rows of cell strings} (shared-strings table)."""
    strings: list[str] = []
    string_ids: dict[str, int] = {}

    def sid(s: str) -> int:
        if s not in string_ids:
            string_ids[s] = len(strings)
            strings.append(s)
        return string_ids[s]

    parts = {"[Content_Types].xml": "<Types/>"}
    sheet_decls, rels = [], []
    for i, (name, rows) in enumerate(sheets.items(), start=1):
        rows_xml = []
        for r, row in enumerate(rows, start=1):
            cells = "".join(
                f'<c r="{chr(64 + ci)}{r}" t="s"><v>{sid(cell)}</v></c>'
                for ci, cell in enumerate(row, start=1)
            )
            rows_xml.append(f'<row r="{r}">{cells}</row>')
        parts[f"xl/worksheets/sheet{i}.xml"] = (
            f'<?xml version="1.0"?><worksheet xmlns="{_S}">'
            f"<sheetData>{''.join(rows_xml)}</sheetData></worksheet>"
        )
        sheet_decls.append(
            f'<sheet name="{name}" sheetId="{i}" r:id="rId{i}"/>'
        )
        rels.append(
            f'<Relationship Id="rId{i}" Type="t" '
            f'Target="worksheets/sheet{i}.xml"/>'
        )
    parts["xl/workbook.xml"] = (
        f'<?xml version="1.0"?><workbook xmlns="{_S}" xmlns:r="{_R}">'
        f"<sheets>{''.join(sheet_decls)}</sheets></workbook>"
    )
    parts["xl/_rels/workbook.xml.rels"] = (
        f'<?xml version="1.0"?><Relationships xmlns="{_PKG}">'
        f"{''.join(rels)}</Relationships>"
    )
    parts["xl/sharedStrings.xml"] = (
        f'<?xml version="1.0"?><sst xmlns="{_S}">'
        + "".join(f"<si><t>{s}</t></si>" for s in strings)
        + "</sst>"
    )
    return _zip(parts)
