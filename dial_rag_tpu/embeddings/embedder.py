"""The local embedding model: tokenizer + JAX encoder + batching policy.

Mirrors the reference's bge_embedding singleton semantics
(aidial_rag/embeddings/embeddings.py): documents are embedded as-is;
queries get the BGE instruction prefix (langchain's
HuggingFaceBgeEmbeddings default for English models); outputs are
L2-normalized CLS poolings.

The batching policy follows the reference's fairness decision: batches run
*sequentially* (batched.py:42-45) so concurrent requests interleave at
batch granularity — here each batch is one TPU dispatch, so fairness holds
at dispatch granularity. The default batch size stays 128 (reference's
OpenVINO-tuned value; on TPU larger is better and configurable).
"""

import hashlib
from collections import deque
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dial_rag_tpu.models.bert import BertConfig, BertEncoder, init_params
from dial_rag_tpu.models.tokenizer import WordPieceTokenizer

# langchain_community's DEFAULT_QUERY_BGE_INSTRUCTION_EN, which the
# reference inherits via HuggingFaceBgeEmbeddings defaults.
DEFAULT_QUERY_INSTRUCTION = (
    "Represent this question for searching relevant passages: "
)

EMBEDDINGS_BATCH_SIZE = 128

# telemetry counter: real (non-padding) tokens entering the encoder
from dial_rag_tpu import telemetry as _telemetry  # noqa: E402

_TOKENS_ENCODED = _telemetry.get_counter("dial_rag.tokens_encoded")
# device-side concat arity for bulk encodes: groups of this many batches
# are concatenated on device and transferred together, so a bulk embed
# costs ~n_batches/_CONCAT_GROUP device->host transfers instead of
# n_batches (transfer latency, not bandwidth, dominates small results)
_CONCAT_GROUP = 8

# dedicated 1-thread executor for host->device staging: one thread keeps
# transfers ordered while overlapping them with device compute
_H2D_STAGER = None


def _h2d_stager():
    global _H2D_STAGER
    if _H2D_STAGER is None:
        from concurrent.futures import ThreadPoolExecutor

        _H2D_STAGER = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="h2d-stage"
        )
    return _H2D_STAGER


def _bucket_rows(n: int, cap: int) -> int:
    """Pad row counts to powers of two (>=8, <=cap) so the encoder jit
    cache holds O(log cap) variants per sequence bucket instead of one
    per distinct batch length."""
    if n >= cap:
        return n
    return min(cap, max(8, 1 << (n - 1).bit_length()))


@partial(
    jax.jit,
    static_argnames=("num_heads", "compute_dtype", "attention_impl", "gelu"),
)
def _token_encode_jit(
    params, input_ids, attention_mask, *, num_heads, compute_dtype,
    attention_impl, gelu,
):
    """[B, S] -> [B, S, D] final hidden states, L2-normalized per token
    (the late-interaction representation; padded rows are garbage and
    sliced away on host by the caller)."""
    from dial_rag_tpu.models.bert import bert_forward

    hidden = bert_forward(
        params,
        input_ids,
        attention_mask,
        num_heads=num_heads,
        compute_dtype=compute_dtype,
        attention_impl=attention_impl,
        gelu=gelu,
    ).astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(hidden * hidden, axis=-1, keepdims=True))
    return hidden / jnp.maximum(norm, 1e-12)


@partial(jax.jit, static_argnames=("q_pad",))
def _query_rows_jit(hidden, attention_mask, *, q_pad):
    """[B, S, D] token-encode output -> ONE query's [q_pad, D] rows with
    padded positions EXACTLY zero. Deliberately a SEPARATE tiny dispatch
    from _token_encode_jit rather than a fused epilogue: fusing the mask
    multiply into the encode program changes XLA's TPU fusion of the
    normalize enough to move the last ulp of every value (measured
    ~9e-8 on-chip), which would break bit-exact parity with the host
    query path — the multiply by 1/0 and static slicing here are exact
    ops, so the rows are byte-identical to the host path's slice of the
    SAME encode program. ``q_pad`` must be the host path's power-of-two
    lane bucket (the query-lane width shapes the MaxSim score matmul; a
    different width can move last-ulp sums and near-tie orderings)."""
    out = (hidden * attention_mask[..., None].astype(hidden.dtype))[0]
    if q_pad <= out.shape[0]:
        return out[:q_pad]
    return jnp.pad(out, ((0, q_pad - out.shape[0]), (0, 0)))


@dataclass
class BgeEmbedder:
    tokenizer: WordPieceTokenizer
    encoder: BertEncoder
    params: dict
    query_instruction: str = DEFAULT_QUERY_INSTRUCTION
    batch_size: int = EMBEDDINGS_BATCH_SIZE
    max_len: int = 512
    mesh: object = None  # jax.sharding.Mesh | None
    # identity of the weights for index-rebuild invalidation: persisted
    # semantic indexes must not be served with a different model's query
    # embeddings (service/documents.py folds this into IndexSettings)
    model_id: str = "random"
    # bulk-pipeline H2D layout: "wide" ships [2, gB, S] int32 ids+mask;
    # "packed" ships [gB, S] uint16 ids + [gB] int32 prefix lengths and
    # rebuilds the mask on device (4x fewer bytes over the host->device
    # link). Packed is the default: every supported vocab (bge-small
    # 30k, first-party mints <=32k) fits uint16, and _use_packed_transfer
    # falls back to wide automatically when one does not.
    transfer_format: str = "packed"

    def shard_over(self, mesh) -> "BgeEmbedder":
        """Data-parallel encode over ``mesh``: weights are replicated
        across all devices once; every batch is sharded over the ``dp``
        axis so bulk indexing throughput scales with chips (the TPU
        counterpart of the reference's single OpenVINO worker thread —
        embeddings.py:38-49). XLA inserts no collectives for the forward
        itself (pure data parallel); only the output gather rides ICI.
        """
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        params = jax.device_put(
            self.params, NamedSharding(mesh, P())
        )
        dp = mesh.shape.get("dp", 1)
        batch_size = self.batch_size + (-self.batch_size) % dp
        return BgeEmbedder(
            tokenizer=self.tokenizer,
            encoder=self.encoder,
            params=params,
            query_instruction=self.query_instruction,
            batch_size=batch_size,  # rounded to a dp multiple
            max_len=self.max_len,
            mesh=mesh,
            model_id=self.model_id,
            transfer_format=self.transfer_format,
        )

    @classmethod
    def from_random(
        cls,
        config: BertConfig | None = None,
        vocab: dict | None = None,
        seed: int = 0,
        compute_dtype=jnp.float32,
        **kw,
    ) -> "BgeEmbedder":
        """Deterministic random-weight embedder (tests / benchmarks; real
        deployments load an HF checkpoint via from_hf_checkpoint)."""
        from dial_rag_tpu.models.tokenizer import build_test_vocab

        config = config or BertConfig.tiny()
        if vocab is None:
            vocab = build_test_vocab([chr(c) for c in range(97, 123)])
        # identity must distinguish random embedders with different
        # seeds/configs/vocabs, or index invalidation is silently
        # defeated in test/benchmark paths (a persisted index built by
        # one tokenization would be served by another)
        vocab_tag = hashlib.sha256(
            "\x00".join(sorted(vocab)).encode("utf-8")
        ).hexdigest()[:8]
        kw.setdefault(
            "model_id",
            f"random-{seed}-{config.hidden_size}x{config.num_layers}"
            f"v{config.vocab_size}-{vocab_tag}",
        )
        return cls(
            tokenizer=WordPieceTokenizer(vocab=vocab),
            encoder=BertEncoder(config, compute_dtype=compute_dtype),
            params=init_params(jax.random.PRNGKey(seed), config),
            **kw,
        )

    @classmethod
    def from_hf_checkpoint(
        cls, model_dir: str, compute_dtype=jnp.bfloat16, **kw
    ) -> "BgeEmbedder":
        """Load a local checkpoint directory in either on-disk layout:

        - plain HF ``BertModel``: config.json + model.safetensors (or
          pytorch_model.bin) + vocab.txt;
        - a ``SentenceTransformer.save()`` tree — what the reference
          actually ships (reference download_model.py,
          embeddings/embeddings.py:29-32): modules.json naming the
          Transformer module dir, ``1_Pooling/config.json`` choosing
          cls vs mean pooling, and ``sentence_bert_config.json``
          carrying max_seq_length.
        """
        import json
        import os

        from dial_rag_tpu.models.bert import load_hf_weights

        def read_json(*parts):
            with open(os.path.join(*parts)) as f:
                return json.load(f)

        transformer_dir = model_dir
        pooling = "cls"
        if os.path.isfile(os.path.join(model_dir, "modules.json")):
            for module in read_json(model_dir, "modules.json"):
                subdir = os.path.join(model_dir, module.get("path", ""))
                kind = module.get("type", "")
                if kind.endswith("models.Transformer"):
                    transformer_dir = subdir
                elif kind.endswith("models.Pooling"):
                    pool_cfg = read_json(subdir, "config.json")
                    if pool_cfg.get("pooling_mode_cls_token"):
                        pooling = "cls"
                    elif pool_cfg.get("pooling_mode_mean_tokens"):
                        pooling = "mean"
                    else:
                        raise ValueError(
                            f"unsupported pooling config in {subdir}: "
                            "need cls or mean token pooling"
                        )
            st_cfg_path = os.path.join(
                transformer_dir, "sentence_bert_config.json"
            )
            if os.path.isfile(st_cfg_path):
                max_len = read_json(st_cfg_path).get("max_seq_length")
                if max_len:
                    kw.setdefault("max_len", int(max_len))

        hf = read_json(transformer_dir, "config.json")
        config = BertConfig(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            intermediate_size=hf["intermediate_size"],
            max_position_embeddings=hf["max_position_embeddings"],
            type_vocab_size=hf.get("type_vocab_size", 2),
        )
        safetensors_path = os.path.join(transformer_dir, "model.safetensors")
        if os.path.isfile(safetensors_path):
            from safetensors.numpy import load_file

            state = load_file(safetensors_path)
            weights_path = safetensors_path
        else:
            torch_path = os.path.join(transformer_dir, "pytorch_model.bin")
            if not os.path.isfile(torch_path):
                raise FileNotFoundError(
                    f"no model.safetensors or pytorch_model.bin under "
                    f"{transformer_dir}"
                )
            import torch

            state = {
                k: v.numpy()
                for k, v in torch.load(
                    torch_path, map_location="cpu", weights_only=True
                ).items()
            }
            weights_path = torch_path
        params = load_hf_weights(state, config)
        # first-party idf pooling artifact: a [V] token-weight table
        # minted by tools/make_idf_pooling.py. When present, the
        # checkpoint serves idf-weighted mean pooling (over per-token
        # normalized hidden states) instead of CLS — the single-vector
        # serving mode for a MaxSim-trained trunk. Queries carry no
        # instruction prefix: the prefix tunes the CLS objective, and
        # its tokens are rare in document corpora (high idf), so under
        # idf pooling it would dominate every query vector.
        idf_path = os.path.join(model_dir, "idf_pooling.npz")
        if os.path.isfile(idf_path):
            weights = np.load(idf_path)["weights"].astype(np.float32)
            if weights.shape != (config.vocab_size,):
                raise ValueError(
                    f"idf_pooling.npz weights shape {weights.shape} does "
                    f"not match vocab_size {config.vocab_size}"
                )
            params["pooling_idf"] = jnp.asarray(weights)
            pooling = "idf"
            kw.setdefault("query_instruction", "")
        tokenizer = WordPieceTokenizer.from_vocab_file(
            os.path.join(transformer_dir, "vocab.txt"),
            lowercase=hf.get("do_lower_case", True),
        )
        # identity = CONTENT hash only: the documented `make checkpoint`
        # flow re-mints weights (and the idf table) in place, so a
        # path-derived identity would serve persisted indexes built by
        # the OLD weights in a mismatched embedding space. The digest
        # covers everything that changes the embedding of a text:
        # weights, the idf pooling table, the tokenizer vocab, and the
        # transformer config (pooling-relevant fields live there). No
        # path component at all — even the basename differs between
        # mounts of the identical checkpoint (docker_compose_local
        # mounts checkpoints/alps-semantic as bge-small-en), and any
        # path part would invalidate every persisted index once per
        # mount spelling.
        if "model_id" not in kw:
            digest = hashlib.sha256()
            # derived behavioral state first: pooling mode and effective
            # max_seq_length come from 1_Pooling/config.json and
            # sentence_bert_config.json (paths vary via modules.json),
            # and both change the embedding of a text without touching
            # the hashed files below. Hash the derived values instead of
            # chasing the file layout.
            digest.update(
                f"pooling={pooling};max_len={kw.get('max_len', '')}".encode()
            )
            for part in (
                weights_path,
                idf_path,
                os.path.join(transformer_dir, "vocab.txt"),
                os.path.join(transformer_dir, "config.json"),
            ):
                if os.path.isfile(part):
                    with open(part, "rb") as f:
                        for block in iter(lambda: f.read(1 << 20), b""):
                            digest.update(block)
            kw["model_id"] = f"sha256:{digest.hexdigest()[:16]}"
        return cls(
            tokenizer=tokenizer,
            encoder=BertEncoder(
                config, compute_dtype=compute_dtype, pooling=pooling
            ),
            params=params,
            **kw,
        )

    @property
    def dim(self) -> int:
        return self.encoder.config.hidden_size

    def _device_put_batch(self, ids, mask):
        """Pad rows to a bucket (bounded jit cache); on a mesh also pad
        to a dp multiple and shard."""
        dp = self.mesh.shape.get("dp", 1) if self.mesh is not None else 1
        b = ids.shape[0]
        target = _bucket_rows(b, self.batch_size)
        target += (-target) % dp
        if target != b:
            ids = np.pad(ids, ((0, target - b), (0, 0)))
            mask = np.pad(mask, ((0, target - b), (0, 0)))
        if self.mesh is None:
            return ids, mask
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(self.mesh, P("dp", None))
        return jax.device_put(ids, sharding), jax.device_put(mask, sharding)

    def _encode_batch(self, texts: list[str]) -> np.ndarray:
        from dial_rag_tpu import telemetry

        ids, mask = self.tokenizer.encode_batch(texts, max_len=self.max_len)
        _TOKENS_ENCODED.add(int(mask.sum()))
        with telemetry.span(
            "encode_dispatch", rows=len(texts), seq=int(ids.shape[1])
        ):
            out = self.encoder.encode(
                self.params, *self._device_put_batch(ids, mask)
            )
        return np.asarray(out)[: len(texts)]

    def _assemble_group(self, toks: list) -> np.ndarray:
        """Stack a group's (ids, mask) pairs into ONE [2, gB, S] int32
        array so the whole group rides a single host->device transfer.
        All batches are row-padded to batch_size; padded rows are fully
        masked and sliced away after decode."""
        s = max(t[0].shape[1] for t in toks)
        gb = len(toks) * self.batch_size
        stacked = np.zeros((2, gb, s), dtype=np.int32)
        for i, (ids, mask) in enumerate(toks):
            r0 = i * self.batch_size
            stacked[0, r0 : r0 + ids.shape[0], : ids.shape[1]] = ids
            stacked[1, r0 : r0 + mask.shape[0], : mask.shape[1]] = mask
        return stacked

    def _encode_group_mixed(self, toks: list):
        """Per-batch encodes at each batch's own sequence bucket; rows
        still pad to batch_size so the caller's span math holds."""
        outs = []
        for ids, mask in toks:
            b = ids.shape[0]
            if b != self.batch_size:
                ids = np.pad(ids, ((0, self.batch_size - b), (0, 0)))
                mask = np.pad(mask, ((0, self.batch_size - b), (0, 0)))
            outs.append(
                self.encoder.encode(
                    self.params, *self._device_put_batch(ids, mask)
                )
            )
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    def _assemble_group_packed(self, toks: list):
        """Packed counterpart of :meth:`_assemble_group`: ids downcast to
        uint16 and the prefix mask collapsed to one length per row (the
        tokenizer always emits prefix masks). The group's H2D payload is
        2 bytes/position + 4 bytes/row instead of 8 bytes/position."""
        s = max(t[0].shape[1] for t in toks)
        gb = len(toks) * self.batch_size
        ids = np.zeros((gb, s), dtype=np.uint16)
        lens = np.zeros(gb, dtype=np.int32)
        for i, (b_ids, b_mask) in enumerate(toks):
            r0 = i * self.batch_size
            ids[r0 : r0 + b_ids.shape[0], : b_ids.shape[1]] = b_ids
            lens[r0 : r0 + b_mask.shape[0]] = b_mask.sum(axis=1)
        return ids, lens

    def _use_packed_transfer(self) -> bool:
        return (
            self.transfer_format == "packed"
            and len(self.tokenizer.vocab) <= 65536
        )

    def _stage_group(self, futures: list):
        """H2D staging step (runs on the 1-thread staging executor):
        wait for the group's tokenization, assemble, and START the
        host->device transfer. Returns ("staged", device_array),
        ("packed", (ids, lens) device arrays), or ("mixed", toks) when
        the group spans sequence buckets."""
        toks = [f.result() for f in futures]
        _TOKENS_ENCODED.add(int(sum(t[1].sum() for t in toks)))
        buckets = {t[0].shape[1] for t in toks}
        if len(buckets) != 1:
            return ("mixed", toks)
        if self._use_packed_transfer():
            ids, lens = self._assemble_group_packed(toks)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                dev = (
                    jax.device_put(
                        ids, NamedSharding(self.mesh, P("dp", None))
                    ),
                    jax.device_put(lens, NamedSharding(self.mesh, P("dp"))),
                )
            else:
                dev = (jax.device_put(ids), jax.device_put(lens))
            return ("packed", dev)
        stacked = self._assemble_group(toks)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dev = jax.device_put(
                stacked, NamedSharding(self.mesh, P(None, "dp", None))
            )
        else:
            dev = jax.device_put(stacked)
        return ("staged", dev)

    def _dispatch_group(self, dev, n_batches: int):
        """ONE encode dispatch for the whole group: [2, gB, S] reshapes
        to [G, B, S] batches encoded batch-serially inside a lax.scan
        (replaces G dispatches + 2G device slices — each dispatch costs
        host latency on a remote-attached device)."""
        from dial_rag_tpu import telemetry

        b = self.batch_size
        g = dev.shape[1] // b
        with telemetry.span(
            "encode_dispatch", rows=int(dev.shape[1]), seq=int(dev.shape[2]),
            group=g,
        ):
            ids = dev[0].reshape(g, b, dev.shape[2])
            mask = dev[1].reshape(g, b, dev.shape[2])
            out = self.encoder.encode_group(self.params, ids, mask)
            return out[: n_batches * b]

    def _dispatch_group_packed(self, dev, n_batches: int):
        """Packed-transfer counterpart of :meth:`_dispatch_group`."""
        from dial_rag_tpu import telemetry

        ids, lens = dev
        b = self.batch_size
        g = ids.shape[0] // b
        with telemetry.span(
            "encode_dispatch", rows=int(ids.shape[0]), seq=int(ids.shape[1]),
            group=g,
        ):
            out = self.encoder.encode_group_packed(
                self.params,
                ids.reshape(g, b, ids.shape[1]),
                lens.reshape(g, b),
            )
            return out[: n_batches * b]

    def _encode_grouped(self, texts: list[str]):
        """Shared bulk pipeline: batches are *dispatched* in order (the
        reference's fairness decision holds at dispatch granularity —
        batched.py:42-45) but not synchronized individually. Batches are
        processed in groups of _CONCAT_GROUP: each group is one
        host->device transfer and its batches are separate in-order
        encode dispatches — transfer *latency* (not bandwidth) dominates
        small arrays, especially on remote-attached accelerators.

        Three overlapped stages:
        - tokenization runs up to 3 groups ahead on the parse pool;
        - host->device staging runs up to 2 groups ahead on a dedicated
          1-thread executor, so each group's transfer ships WHILE the
          device computes earlier groups (a synchronous transfer on the
          dispatch thread was measured to idle the device for ~one
          tunnel round-trip per group — the round-2 39% pipeline gap);
        - the dispatch thread only chains encode calls on already-
          device-resident buffers.

        Returns (group_outs device arrays, batches).
        """
        batches = [
            texts[i : i + self.batch_size]
            for i in range(0, len(texts), self.batch_size)
        ]
        groups = [
            batches[i : i + _CONCAT_GROUP]
            for i in range(0, len(batches), _CONCAT_GROUP)
        ]
        from dial_rag_tpu.runtime.host_pools import get_pools

        pool = get_pools()["parse"]
        stager = _h2d_stager()

        def submit_group(group):
            # per-BATCH futures: the group's batches tokenize in parallel
            # across the parse pool's workers (flat submissions — nesting
            # group tasks that wait on sub-tasks could deadlock a small
            # pool); the staging thread assembles when all are done
            return (
                len(group),
                [
                    pool.submit(
                        self.tokenizer.encode_batch, b, self.max_len
                    )
                    for b in group
                ],
            )

        tok_window: deque = deque()
        stage_window: deque = deque()
        group_outs = []
        it = iter(groups)
        exhausted = False

        def pump():
            nonlocal exhausted
            while not exhausted and len(tok_window) < 3:
                group = next(it, None)
                if group is None:
                    exhausted = True
                    break
                tok_window.append(submit_group(group))
            while tok_window and len(stage_window) < 2:
                n_batches, futures = tok_window.popleft()
                stage_window.append(
                    (n_batches, stager.submit(self._stage_group, futures))
                )

        pump()
        while stage_window:
            n_batches, staged = stage_window.popleft()
            kind, payload = staged.result()
            if kind == "staged":
                group_outs.append(self._dispatch_group(payload, n_batches))
            elif kind == "packed":
                group_outs.append(
                    self._dispatch_group_packed(payload, n_batches)
                )
            else:
                # mixed sequence buckets: stacking would pad every batch
                # to the group max (up to 8x wasted encoder FLOPs);
                # encode each batch at its own width instead
                group_outs.append(self._encode_group_mixed(payload))
            pump()
        return group_outs, batches

    def embed_documents(self, texts: list[str]) -> np.ndarray:
        """[n, D] float32 on host (for record persistence); results come
        back one transfer per group."""
        if not texts:
            return np.zeros((0, self.dim), dtype=np.float32)
        if len(texts) <= self.batch_size:
            return self._encode_batch(texts)
        group_outs, batches = self._encode_grouped(texts)
        jax.block_until_ready(group_outs)
        host = np.concatenate(jax.device_get(group_outs), axis=0)
        # each batch's real rows are the first len(batch) of its
        # batch_size-row span
        pieces = []
        for i, batch in enumerate(batches):
            r0 = i * self.batch_size
            pieces.append(host[r0 : r0 + len(batch)])
        return np.concatenate(pieces, axis=0)

    def embed_documents_device(self, texts: list[str]):
        """Device-resident bulk encode: [n, D] embeddings left in HBM.

        The TPU-native indexing pipeline appends embeddings straight
        into the device index (DenseIndex.from_device_matrix) — they
        never cross to the host on the hot path (host transfer is only
        needed for record persistence, which is off the critical path).
        """
        if not texts:
            return jnp.zeros((0, self.dim), dtype=jnp.float32)
        if len(texts) <= self.batch_size:
            ids, mask = self.tokenizer.encode_batch(
                texts, max_len=self.max_len
            )
            out = self.encoder.encode(
                self.params, *self._device_put_batch(ids, mask)
            )
            return out[: len(texts)]
        group_outs, batches = self._encode_grouped(texts)
        full = (
            group_outs[0]
            if len(group_outs) == 1
            else jnp.concatenate(group_outs, axis=0)
        )
        if len(texts) == len(batches) * self.batch_size:
            return full  # no padded rows anywhere
        keep = np.concatenate(
            [
                np.arange(len(b)) + i * self.batch_size
                for i, b in enumerate(batches)
            ]
        )
        return jnp.take(full, jnp.asarray(keep), axis=0)

    def embed_documents_tokens(
        self, texts: list[str], max_tokens: int = 256
    ) -> list[np.ndarray]:
        """Per-TOKEN embeddings for the late-interaction (MaxSim) index:
        one ``[t_i, D]`` f32 array per text — the encoder's final hidden
        states, L2-normalized per token (MaxSim scores are then per-token
        cosines), real tokens only (incl. CLS/SEP, as ColBERT keeps its
        markers), truncated to ``max_tokens``."""
        if not texts:
            return []
        out: list[np.ndarray] = []
        for i in range(0, len(texts), self.batch_size):
            batch = texts[i : i + self.batch_size]
            ids, mask = self.tokenizer.encode_batch(
                batch, max_len=min(self.max_len, max_tokens)
            )
            hidden = np.asarray(
                _token_encode_jit(
                    self.params,
                    *self._device_put_batch(ids, mask),
                    num_heads=self.encoder.config.num_heads,
                    compute_dtype=self.encoder.compute_dtype,
                    attention_impl=self.encoder.attention_impl,
                    gelu=self.encoder.gelu,
                )
            )
            for row in range(len(batch)):
                t = int(mask[row].sum())
                out.append(hidden[row, :t].astype(np.float32))
        return out

    def embed_query_tokens(
        self, text: str, max_tokens: int = 64
    ) -> np.ndarray:
        """[t, D] per-token query embeddings for MaxSim (no instruction
        prefix: the BGE instruction tunes the CLS pooling objective, not
        token-level matching)."""
        return self.embed_documents_tokens([text], max_tokens=max_tokens)[0]

    async def aembed_query_tokens(self, text: str) -> np.ndarray:
        from dial_rag_tpu.runtime.host_pools import (
            run_in_query_dispatch_pool,
        )

        return await run_in_query_dispatch_pool(
            self.embed_query_tokens, text
        )

    def embed_query_tokens_device(self, text: str, max_tokens: int = 64):
        """[q_pad, D] per-token query embeddings left ON DEVICE (one
        dispatch, no D2H): normalized final hidden states with padded
        positions exactly zero, already at the SAME power-of-two
        query-lane bucket the host path would pad to, so
        ``LateInteractionIndex.find`` consumes the rows directly with
        BIT-IDENTICAL scores (every position counts as a real token;
        zero tokens score 0 against every chunk) and the encode->MaxSim
        dependency resolves in HBM — the request's only host sync is
        the final top-k fetch."""
        from dial_rag_tpu import telemetry
        from dial_rag_tpu.index.late_interaction import (
            _MAX_Q_LANES,
            _bucket_q,
        )

        ids, mask = self.tokenizer.encode_batch(
            [text], max_len=min(self.max_len, max_tokens)
        )
        t = int(mask[0].sum())
        _TOKENS_ENCODED.add(t)
        q_pad = _bucket_q(max(1, min(t, _MAX_Q_LANES)))
        with telemetry.span(
            "encode_dispatch", rows=1, seq=int(ids.shape[1])
        ):
            dev_ids, dev_mask = self._device_put_batch(ids, mask)
            hidden = _token_encode_jit(
                self.params,
                dev_ids,
                dev_mask,
                num_heads=self.encoder.config.num_heads,
                compute_dtype=self.encoder.compute_dtype,
                attention_impl=self.encoder.attention_impl,
                gelu=self.encoder.gelu,
            )
            # second (tiny) dispatch — see _query_rows_jit for why the
            # mask/slice must not fuse into the encode program
            return _query_rows_jit(hidden, dev_mask, q_pad=q_pad)

    async def aembed_query_tokens_device(self, text: str):
        from dial_rag_tpu.runtime.host_pools import (
            run_in_query_dispatch_pool,
        )

        return await run_in_query_dispatch_pool(
            self.embed_query_tokens_device, text
        )

    async def aembed_documents_tokens(
        self, texts: list[str], max_tokens: int = 256
    ) -> list[np.ndarray]:
        from dial_rag_tpu.runtime.host_pools import (
            run_in_indexing_dispatch_pool,
        )

        return await run_in_indexing_dispatch_pool(
            self.embed_documents_tokens, texts, max_tokens
        )

    def embed_query(self, text: str) -> np.ndarray:
        """[D] float32 with the BGE query instruction prefix."""
        return self._encode_batch([self.query_instruction + text])[0]

    def embed_queries(self, texts: list[str]) -> np.ndarray:
        """[n, D] query embeddings (instruction-prefixed), one dispatch."""
        if not texts:
            return np.zeros((0, self.dim), dtype=np.float32)
        return self._encode_batch(
            [self.query_instruction + t for t in texts]
        )

    def embed_queries_device(self, texts: list[str]):
        """[n, D] query embeddings left on device (one dispatch, no D2H).

        The serving query chain hands these rows straight to
        ``DenseIndex.find``, so the encode->scan dependency resolves in
        HBM and the request's only host sync is the final top-k fetch —
        one host round-trip instead of three (encode fetch, query
        upload, hits fetch), which matters when the device sits behind
        a high-latency link."""
        from dial_rag_tpu import telemetry

        if not texts:
            return jnp.zeros((0, self.dim), dtype=jnp.float32)
        out, n = self._embed_queries_wave(texts)
        # avoid a spurious eager slice op when the batch wasn't padded
        # (eager dispatches are not free behind a remote device link)
        if int(out.shape[0]) == n:
            return out
        return out[:n]

    def _embed_queries_wave(self, texts: list[str]):
        """Unsliced wave output ``([Qb, D] device array, n_real)``: the
        trailing ``Qb - n`` rows are encodes of padding and must be
        ignored by the caller. The coalesced query path hands waiters
        DeviceRow views into this array so no per-row slices dispatch
        (see utils/device_rows.py)."""
        from dial_rag_tpu import telemetry

        ids, mask = self.tokenizer.encode_batch(
            [self.query_instruction + t for t in texts],
            max_len=self.max_len,
        )
        _TOKENS_ENCODED.add(int(mask.sum()))
        with telemetry.span(
            "encode_dispatch", rows=len(texts), seq=int(ids.shape[1])
        ):
            out = self.encoder.encode(
                self.params, *self._device_put_batch(ids, mask)
            )
        return out, len(texts)

    async def aembed_documents(self, texts: list[str]) -> np.ndarray:
        """Bulk encode through the 1-worker indexing dispatch pool:
        concurrent indexing streams interleave at batch granularity
        (reference embeddings.py:72-97 routes to dedicated pools)."""
        from dial_rag_tpu.runtime.host_pools import (
            run_in_indexing_dispatch_pool,
        )

        return await run_in_indexing_dispatch_pool(
            self.embed_documents, texts
        )

    async def aembed_query(self, text: str):
        """One DEVICE-RESIDENT [D] row as an np-coercible ``DeviceRow``
        view into the wave's shared encode output.

        Query encodes take their own lane so they never queue behind
        a bulk indexing stream's host tokenization; concurrent queries
        from different requests coalesce into ONE device dispatch via
        the micro-batcher (a [Q, S] encode costs nearly the same as
        [1, S]). The result stays on device — and unmaterialized — so
        ``DenseIndex.afind`` waves scan the shared encode output with
        zero per-row dispatches; call ``np.asarray`` on it when host
        floats are actually needed."""
        return await self._query_batcher.submit(text)

    @property
    def _query_batcher(self):
        batcher = self.__dict__.get("_query_batcher_cached")
        if batcher is None:
            from dial_rag_tpu.runtime.host_pools import (
                run_in_query_dispatch_pool,
            )
            from dial_rag_tpu.runtime.micro_batcher import (
                MicroBatcher,
                PerLoopBatcher,
            )

            from dial_rag_tpu.utils.device_rows import DeviceRow

            async def encode_all(texts: list[str]):
                # waiters get zero-copy views into the shared wave
                # output — per-row slicing would pay one eager dispatch
                # (and, behind the tunnel, one ~1 s compile per distinct
                # (bucket, offset)) per request, re-serializing the
                # round-trip the wave exists to share
                out, n = await run_in_query_dispatch_pool(
                    self._embed_queries_wave, texts
                )
                return [DeviceRow(out, i) for i in range(n)]

            batcher = PerLoopBatcher(
                lambda: MicroBatcher(encode_all, max_batch=64)
            )
            self.__dict__["_query_batcher_cached"] = batcher
        return batcher
