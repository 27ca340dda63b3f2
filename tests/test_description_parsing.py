"""Tolerant vision-LLM JSON parsing for the description retriever
(mirror of the reference's repair logic tests,
description_retriever.py:257-280)."""

from dial_rag_tpu.retrieval.description import (
    PageDescription,
    parse_page_description,
    repair_and_parse_json,
)


def test_clean_json():
    out = repair_and_parse_json('{"page_summary": "hello"}')
    assert out == {"page_summary": "hello"}


def test_markdown_fences_stripped():
    out = repair_and_parse_json(
        'Sure! Here is the JSON:\n```json\n{"keyfact": "x"}\n```\nDone.'
    )
    assert out == {"keyfact": "x"}


def test_trailing_commas_repaired():
    out = repair_and_parse_json(
        '{"images": [{"description": "a",},], "keyfact": "k",}'
    )
    assert out["images"] == [{"description": "a"}]
    assert out["keyfact"] == "k"


def test_surrounding_prose_ignored():
    out = repair_and_parse_json(
        'The page shows: {"page_summary": "s"} hope that helps'
    )
    assert out == {"page_summary": "s"}


def test_no_json_raises():
    import pytest

    with pytest.raises(ValueError):
        repair_and_parse_json("no braces here at all")


def test_parse_falls_back_to_raw_text():
    desc = parse_page_description("just plain prose about the page")
    assert desc.page_summary == "just plain prose about the page"
    assert desc.to_chunks() == ["just plain prose about the page"]


def test_parse_full_description():
    desc = parse_page_description(
        """{"page_summary": "A mountain overview.",
            "keyfact": "Peak is 4000m.",
            "images": [{"description": "Chart of heights",
                        "keyfact": "Highest bar is Mont X"}],
            "tables": [{"description": "No tables are present"}]}"""
    )
    chunks = desc.to_chunks()
    assert chunks == [
        "A mountain overview.",
        "Peak is 4000m.",
        "Chart of heights",
        "Highest bar is Mont X",
    ]  # "No tables are present" boilerplate skipped


def test_image_quality_levels_parsed():
    """Reference contract (page_description.py:82-90): detailed->high,
    normal->low, anything else (incl. missing)->auto; the explanation
    is stored. Quality is metadata, never embedded as a chunk."""
    detailed = parse_page_description(
        '{"page_summary": "s",'
        ' "image_quality": {"level": "Detailed",'
        ' "explanation": "fine print in the diagram"}}'
    )
    assert detailed.image_quality == "high"
    assert detailed.image_quality_explanation == "fine print in the diagram"

    normal = parse_page_description(
        '{"image_quality": {"level": "normal", "explanation": "plain"}}'
    )
    assert normal.image_quality == "low"

    weird = parse_page_description(
        '{"image_quality": {"level": "ultra-mega", "explanation": "?"}}'
    )
    assert weird.image_quality == "auto"

    missing = parse_page_description('{"page_summary": "s"}')
    assert missing.image_quality == "auto"
    assert missing.image_quality_explanation == ""

    not_a_dict = parse_page_description('{"image_quality": "detailed"}')
    assert not_a_dict.image_quality == "auto"

    # quality text must not leak into the embedded chunks
    assert detailed.to_chunks() == ["s"]


def test_non_dict_items_dropped():
    desc = parse_page_description(
        '{"images": ["just a string", {"description": "real"}]}'
    )
    assert desc.images == [{"description": "real"}]


def test_empty_description_has_no_chunks():
    assert PageDescription().to_chunks() == []
