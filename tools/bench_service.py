"""Service-level latency bench: the REAL aiohttp app end to end.

Measures p50/p95 of a ``retrieval``-type chat-completion request —
HTTP -> config merge -> index load -> query tokenize -> encode dispatch
-> dense scan -> BM25 -> RRF -> RetrievalResponse — against a fake Dial
core, with a pre-persisted synthetic index at corpus scale (the
documents are index-cache hits, as in steady-state serving; the
reference path being timed is reference app.py:247 ->
retrieval_chain.py:273-279).

Context for reading the numbers: every device dispatch through the
remote ``axon`` TPU tunnel costs ~60-100 ms of round-trip latency that
a locally-attached chip does not pay. A retrieval request makes 2-3
dispatches (query encode, dense scan; BM25 may batch in), so the tunnel
sets a floor of roughly 150-300 ms on p50 here, with single-digit ms of
actual device time inside it (see bench.py's device-honest rows). The
measurement is still end-to-end honest for THIS environment and pins
the host-side pipeline cost (config merge, record memo, retriever
construction, RRF, response serialization).

Run standalone:  python -m tools.bench_service [--n-chunks 100000]
"""

import argparse
import asyncio
import json
import time

import numpy as np


def _make_chunks(n: int, rng) -> list:
    from dial_rag_tpu.documents.model import Chunk

    words = np.array(
        (
            "alps mountain range europe climate glacier peak valley river "
            "snow pass tourism geology flora fauna history culture village"
        ).split()
    )
    draws = words[rng.integers(0, len(words), size=(n, 8))]
    texts = [" ".join(row) for row in draws]
    chunks = []
    for i, text in enumerate(texts):
        chunks.append(
            Chunk(
                text=f"{text} c{i}",
                metadata={
                    "chunk_id": i,
                    "page_number": (i % 50) + 1,
                    "source": "files/user-bucket/corpus.pdf",
                    "source_display_name": "corpus.pdf",
                },
            )
        )
    return chunks


def _doc_pdf() -> bytes:
    """A real 50-page PDF: the retrieval response rasterizes retrieved
    pages from document_bytes, so that path must run for real."""
    from tests.utils.pdf_builder import build_pdf

    return build_pdf(
        [[(72, 720, 12, f"corpus page {p + 1}")] for p in range(50)],
        compress=True,
    )


async def _build_record(
    chunks, embedder, settings, doc_bytes, li_tokens: int = 0,
    with_chargram: bool = False,
):
    """Synthetic DocumentRecord: real BM25 token index + random unit
    embeddings (the scan cost is content-independent). ``li_tokens`` > 0
    also attaches a late-interaction index with that many random unit
    token rows per chunk (MaxSim scan cost is content-independent too);
    ``with_chargram`` attaches the REAL char-n-gram word index (its
    build and scan cost are content-dependent, so the real thing runs)."""
    from dial_rag_tpu.documents.model import (
        FORMAT_VERSION,
        DocumentRecord,
        pack_simple_embeddings,
    )
    from dial_rag_tpu.retrieval import Bm25Retriever, ChargramRetriever

    rng = np.random.default_rng(5)
    emb = rng.standard_normal((len(chunks), embedder.dim)).astype(
        np.float32
    )
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    li_index = None
    if li_tokens:
        rows = rng.standard_normal(
            (len(chunks), li_tokens, embedder.dim)
        ).astype(np.float32)
        rows /= np.linalg.norm(rows, axis=2, keepdims=True)
        li_index = list(rows)
    text_index = await Bm25Retriever.build_index(chunks)
    chargram_index = (
        await ChargramRetriever.build_index(chunks)
        if with_chargram
        else None
    )
    return DocumentRecord(
        format_version=FORMAT_VERSION,
        index_settings=settings,
        chunks=chunks,
        text_index=text_index,
        embeddings_index=pack_simple_embeddings(emb),
        multimodal_embeddings_index=None,
        description_embeddings_index=None,
        late_interaction_index=li_index,
        chargram_index=chargram_index,
        mime_type="application/pdf",
        document_bytes=doc_bytes,
    )


async def run_service_bench(
    n_chunks: int = 100_000,
    reps: int = 20,
    embedder=None,
    with_li: bool = False,
    li_tokens: int = 8,
    with_chargram: bool = False,
    concurrency: int = 0,
    profile: bool = False,
) -> dict:
    import tempfile

    from aiohttp.test_utils import TestClient, TestServer

    from dial_rag_tpu.embeddings.embedder import BgeEmbedder
    from dial_rag_tpu.service.app import create_app
    from dial_rag_tpu.service.config import AppConfig
    from dial_rag_tpu.storage.storage import (
        IndexStorage,
        LocalFileStorage,
        link_to_index_url,
    )
    from tests.utils.fake_dial import FakeDialCore

    fake = FakeDialCore()
    dial_url = await fake.start()
    doc_url = "files/user-bucket/corpus.pdf"
    doc_bytes = _doc_pdf()
    fake.add_file(doc_url, doc_bytes, "application/pdf")

    if embedder is None:
        from dial_rag_tpu.models.tokenizer import build_test_vocab

        vocab = build_test_vocab(
            sorted(
                set(
                    "alps mountain range europe climate glacier peak "
                    "valley river snow pass tourism geology flora fauna "
                    "history culture village what is the in of "
                    "represent this question for searching relevant "
                    "passages".split()
                )
            ),
            size=4096,
        )
        embedder = BgeEmbedder.from_random(vocab=vocab, batch_size=128)

    storage_dir = tempfile.mkdtemp(prefix="dial_rag_bench_idx_")
    app_config = AppConfig.model_validate(
        {
            "dial_url": dial_url,
            "index_storage": {"local_storage_path": storage_dir},
        }
    )

    # disable the remote-LLM indexes per request (the e2e tests do the
    # same via custom_fields)
    custom_configuration = {
        "indexing": {
            "description_index": None,
            "multimodal_index": None,
            # with_li exercises the third local arm: the device-resident
            # MaxSim path (query rows never leave HBM between encode and
            # scan); bf16 storage halves the HBM footprint at f32
            # accumulation
            "late_interaction_index": (
                {
                    "max_chunk_tokens": li_tokens,
                    "index_dtype": "bfloat16",
                }
                if with_li
                else None
            ),
            # with_chargram exercises the model-free fuzzy-lexical arm
            # (the round-4 tuned profile's new component) end to end
            "chargram_index": ({} if with_chargram else None),
        },
        "request": {"type": "retrieval"},
    }

    # persist the corpus record exactly where the request will look for
    # it: compute the index settings through the SAME merge the app
    # applies to this request
    from dial_rag_tpu.service.config import Configuration, merge_config

    configuration = merge_config(
        Configuration(), app_config.request.model_dump(exclude_unset=True)
    )
    configuration = merge_config(configuration, custom_configuration)
    settings = configuration.indexing.collect_fields_that_rebuild_index()
    settings.indexes["embedder"] = {"model_id": embedder.model_id}
    rng = np.random.default_rng(3)
    t0 = time.perf_counter()
    record = await _build_record(
        _make_chunks(n_chunks, rng),
        embedder,
        settings,
        doc_bytes,
        li_tokens=li_tokens if with_li else 0,
        with_chargram=with_chargram,
    )
    build_s = time.perf_counter() - t0
    index_url = link_to_index_url(doc_url, "test-bucket")
    await IndexStorage(LocalFileStorage(storage_dir)).store(
        index_url, record
    )

    app = create_app(app_config, embedder=embedder)
    server = TestServer(app)
    client = TestClient(server)
    await client.start_server()
    try:
        payload = {
            "stream": False,
            "custom_fields": {"configuration": custom_configuration},
            "messages": [
                {
                    "role": "user",
                    "content": "what bounds the southern alps climate",
                    "custom_content": {
                        "attachments": [{"url": doc_url}]
                    },
                }
            ],
        }

        import aiohttp

        # the warmup request pays one-time costs a serving replica pays
        # at boot (remote kernel compiles up to ~250 s each + the index
        # upload through the tunnel) — far past aiohttp's default 5 min
        # client timeout, so give every request a generous budget; the
        # timed reps finish in milliseconds-to-seconds regardless
        _timeout = aiohttp.ClientTimeout(total=1800)

        async def one_request(query: str) -> float:
            body = json.loads(json.dumps(payload))
            body["messages"][0]["content"] = query
            t0 = time.perf_counter()
            resp = await client.post(
                "/openai/deployments/dial-rag/chat/completions",
                json=body,
                headers={"api-key": "bench-key"},
                timeout=_timeout,
            )
            data = await resp.json()
            dt = time.perf_counter() - t0
            assert resp.status == 200, data
            att = data["choices"][0]["message"]["custom_content"][
                "attachments"
            ]
            assert any(
                a.get("title") == "Retrieval response" for a in att
            ), att
            return dt

        async def assert_arms_engaged():
            """The profile must fail loudly if an arm silently did not
            build (e.g. an IndexSettings mismatch re-indexed the doc
            without the arm) — a wrong-arm measurement is worse than no
            measurement."""
            body = json.loads(json.dumps(payload))
            resp = await client.post(
                "/openai/deployments/dial-rag/chat/completions",
                json=body,
                headers={"api-key": "bench-key"},
                timeout=_timeout,
            )
            data = await resp.json()
            stages = [
                s["name"]
                for s in data["choices"][0]["message"]["custom_content"][
                    "stages"
                ]
            ]
            assert any("Embeddings search" in s for s in stages), stages
            assert any("Keywords search" in s for s in stages), stages
            if with_li:
                assert any(
                    "Late interaction search" in s for s in stages
                ), stages
            if with_chargram:
                assert any(
                    "Fuzzy keywords search" in s for s in stages
                ), stages

        # warmup: compiles the scan shapes AND every query-encode /
        # query-lane bucket the timed queries can land in (a 4-7 word
        # query can tokenize into different power-of-two lane buckets;
        # an uncovered bucket recompiles mid-timing and lands in p95)
        await one_request("warmup glacier river query")
        await assert_arms_engaged()
        await one_request("warmup pass")
        await one_request(
            "warmup mountain valley snow tourism geology flora "
            "fauna history culture village climate"
        )
        words = (
            "alps climate glacier peak river snow tourism geology "
            "valley culture"
        ).split()
        # cover the EXACT timed-query shape (4 words + an id suffix —
        # the suffix's subword tokens can cross a query-lane bucket
        # boundary the plain warmups never touch; an uncovered bucket
        # recompiles mid-timing and lands a multi-second p95 outlier)
        await one_request("warmup peak snow river w0")
        # compile-ahead barrier: the first request's index build spawned
        # warm_query_buckets threads (every batched wave bucket); keep
        # those compiles out of the timed phases
        await asyncio.get_running_loop().run_in_executor(
            None,
            client.server.app["dial_rag"].device_index_cache.wait_warm,
        )
        times = []
        for i in range(reps):
            q = " ".join(rng.choice(words, size=4)) + f" q{i}"
            times.append(await one_request(q))
        times_ms = sorted(t * 1e3 for t in times)
        import sys

        print(
            "rep times ms:",
            [round(t, 1) for t in times_ms],
            file=sys.stderr,
        )
        p50 = times_ms[len(times_ms) // 2]
        p95 = times_ms[min(len(times_ms) - 1, int(len(times_ms) * 0.95))]
        out = {
            "n_chunks": n_chunks,
            "p50_ms": p50,
            "p95_ms": p95,
            "reps": reps,
            "index_build_s": round(build_s, 2),
            "with_li": with_li,
            "with_chargram": with_chargram,
        }
        if concurrency > 1:
            # concurrent-load phase: the sequential p50 above is
            # dominated by per-dispatch link RTT; under concurrent
            # requests the query micro-batcher coalesces in-flight
            # encodes into one device dispatch (embedder.aembed_query),
            # so QPS — the production serving number — amortizes the
            # round-trips that serial latency cannot
            creps = max(reps, concurrency * 4)
            sem = asyncio.Semaphore(concurrency)

            async def timed(q: str) -> float:
                async with sem:
                    return await one_request(q)

            # FRESH queries per burst: identical repeat dispatches are
            # served from the tunnel's transport cache (the round-1
            # artifact) and would fake sub-RTT latencies
            bursts = [
                [
                    " ".join(rng.choice(words, size=4)) + f" cq{b}_{i}"
                    for i in range(creps)
                ]
                for b in range(2)
            ]
            # untimed concurrent warmup burst: the coalesced waves hit
            # BATCHED query-lane buckets (Q=2..concurrency) the serial
            # warmup never compiles; an uncompiled bucket recompiles
            # mid-measurement (observed: 2.3 s) and poisons QPS/p95
            warm = [
                " ".join(rng.choice(words, size=4)) + f" cw{i}"
                for i in range(concurrency)
            ]
            await asyncio.gather(*(one_request(q) for q in warm))
            prof = None
            if profile:
                from dial_rag_tpu.utils.sampling_profiler import (
                    SamplingProfiler,
                )

                prof = SamplingProfiler(interval=0.005)
                prof.start()

            from dial_rag_tpu import telemetry

            def _wave_stats() -> tuple[float, float]:
                reg = telemetry.metrics()
                return reg.total("microbatch_waves"), reg.total(
                    "microbatch_items"
                )

            # best-of-2: the tunnel's throughput drifts within long
            # measurement windows (observed 28 vs 61 QPS for the same
            # build in one bench run vs standalone); two bursts bound
            # the noise at ~seconds of extra wall clock
            waves0, items0 = _wave_stats()
            ctimes = None
            wall = float("inf")
            for burst_queries in bursts:
                t0 = time.perf_counter()
                burst_times = await asyncio.gather(
                    *(timed(q) for q in burst_queries)
                )
                burst_wall = time.perf_counter() - t0
                if burst_wall < wall:
                    wall, ctimes = burst_wall, burst_times
            if prof is not None:
                import sys

                prof.stop()
                print(prof.render(min_fraction=0.02), file=sys.stderr)
            ctimes_ms = sorted(t * 1e3 for t in ctimes)
            waves1, items1 = _wave_stats()
            out["concurrency"] = concurrency
            out["concurrent_reps"] = creps
            out["qps"] = round(creps / wall, 2)
            if waves1 > waves0:
                out["avg_wave_items"] = round(
                    (items1 - items0) / (waves1 - waves0), 2
                )
                out["waves"] = int(waves1 - waves0)
            out["concurrent_p50_ms"] = ctimes_ms[len(ctimes_ms) // 2]
            out["concurrent_p95_ms"] = ctimes_ms[
                min(len(ctimes_ms) - 1, int(len(ctimes_ms) * 0.95))
            ]
        return out
    finally:
        await client.close()
        await fake.stop()


def main(argv=None):
    from eval._platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    from dial_rag_tpu.runtime.compile_cache import (
        default_cache_dir,
        init_compilation_cache,
    )

    init_compilation_cache(default_cache_dir())
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--n-chunks", type=int, default=100_000)
    parser.add_argument("--reps", type=int, default=20)
    parser.add_argument(
        "--with-li",
        action="store_true",
        help="enable the late-interaction arm (device-resident MaxSim "
        "query path) alongside dense + BM25",
    )
    parser.add_argument(
        "--with-chargram",
        action="store_true",
        help="enable the char-n-gram fuzzy-lexical arm alongside "
        "dense + BM25",
    )
    parser.add_argument(
        "--concurrency",
        type=int,
        default=0,
        help="also run a concurrent-load phase with this many in-flight "
        "requests and report QPS (micro-batcher coalescing)",
    )
    parser.add_argument(
        "--profile",
        action="store_true",
        help="wrap the concurrent phase in the sampling profiler and "
        "print the wall-clock call tree to stderr",
    )
    args = parser.parse_args(argv)
    out = asyncio.run(
        run_service_bench(
            args.n_chunks,
            args.reps,
            with_li=args.with_li,
            with_chargram=args.with_chargram,
            concurrency=args.concurrency,
            profile=args.profile,
        )
    )
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
