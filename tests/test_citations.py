"""Citation rewriting parity (cases mirror reference
tests/test_reference_documents.py behaviors)."""

from dial_rag_tpu.service.citations import rewrite_citations


async def run(pieces, n):
    text = []
    used = None
    async def gen():
        for p in pieces:
            yield p

    async for piece, final in rewrite_citations(gen(), n):
        if final is not None:
            used = final
        else:
            text.append(piece)
    return "".join(text), used


async def test_simple_rewrite():
    text, used = await run(["Answer <[2]> and more <[5]>."], 5)
    assert text == "Answer [1] and more [2]."
    assert used == [1, 4]


async def test_repeat_reuses_number():
    text, used = await run(["a <[3]> b <[1]> c <[3]> d"], 5)
    assert text == "a [1] b [2] c [1] d"
    assert used == [2, 0]


async def test_tag_split_across_chunks():
    text, used = await run(["first chunk <[", "1]> second chunk"], 3)
    assert text == "first chunk [1] second chunk"
    assert used == [0]


async def test_tag_split_at_angle_bracket():
    text, used = await run(["piece <", "[2]> end"], 3)
    assert text == "piece [1] end"
    assert used == [1]


async def test_out_of_bounds_passthrough():
    text, used = await run(["see <[23]> here"], 3)
    assert text == "see <[23]> here"
    assert used == []


async def test_literal_brackets_untouched():
    text, used = await run(["array[0] and [5] stay"], 3)
    assert text == "array[0] and [5] stay"
    assert used == []


async def test_unterminated_tag_flushed_at_end():
    text, used = await run(["ends with <["], 3)
    assert text == "ends with <["
    assert used == []


async def test_no_citations():
    text, used = await run(["hello ", "world"], 0)
    assert text == "hello world"
    assert used == []


async def test_multi_citation_same_sentence():
    text, used = await run(["x <[1]> <[2]> y"], 2)
    assert text == "x [1] [2] y"
    assert used == [0, 1]
