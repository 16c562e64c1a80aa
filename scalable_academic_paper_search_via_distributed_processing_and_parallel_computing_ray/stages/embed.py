"""Embedding-generator stage (reference ST1: SentenceTransformer loaded once
per task inside a SCALAR_ITER pandas UDF, ``embed_generator.py:22-46``).

Re-expressed as the canonical Ray Data actor-pool pattern: the "model" loads
ONCE per actor in ``__init__``; ``__call__`` encodes a batch.  No model
weights exist in this sandbox, so the model is a deterministic fake (hashed
bag-of-words projection, L2-normalized) behind the same interface — swap
``_load_model`` for a real sentence-transformers call on a GPU pool
(``map_batches(EmbedDocs, concurrency=N, num_gpus=1, batch_size=2048)``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.textstats import token_hashes

EMBED_DIM = 64


class EmbedDocs:
    """(doc_id, text) -> + embedding: list<float32>[dim].

    ``device`` mirrors the reference's per-task device pick
    (``embed_generator.py:29-34``: cuda if available, float16 to fit):
    None auto-selects (cuda when a GPU framework is importable, else
    cpu); an explicit "cuda:N"/"cpu" pins it.  The fake model ignores the
    device but records the resolved choice so placement is testable
    without hardware; pair with ``map_batches(..., num_gpus=1)`` via
    :func:`embed_docs` to actually reserve the GPU."""

    def __init__(self, dim: int = EMBED_DIM, batch_hint: int = 2048,
                 device: str | None = None):
        self.dim = dim
        self.batch_hint = batch_hint  # reference encodes 2048 per call
        self.device = self._resolve_device(device)
        self.model = self._load_model()

    @staticmethod
    def _resolve_device(device: str | None) -> str:
        if device is not None:
            return device
        try:
            import torch  # noqa: F401  (absent in sandbox)
            if torch.cuda.is_available():
                return "cuda"
        except ImportError:
            pass
        return "cpu"

    def _load_model(self):
        try:
            import sentence_transformers  # noqa: F401  (absent in sandbox)
            return "sentence-transformers"
        except ImportError:
            return "fake-hash-projection"

    def _encode(self, texts: list[str]) -> np.ndarray:
        """Batch-vectorized hashed bag-of-words: Arrow tokenize, string
        hashing paid once per UNIQUE token (dictionary encode), one
        scatter-add.  Bit-identical to the per-doc loop it replaced —
        the accumulated values are exact (+/-1 sums in float64), so
        accumulation order cannot change the result."""
        import pyarrow as pa

        from .text import flat_tokens

        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        flat, par = flat_tokens(pa.array(texts, pa.string()),
                                drop_stopwords=True)
        parn = par.to_numpy(zero_copy_only=False)
        enc = flat.dictionary_encode()
        vocab = enc.dictionary.to_pylist()
        if vocab:
            vh = token_hashes(vocab)
            th = vh[enc.indices.to_numpy(zero_copy_only=False)]
            idx = (th % np.uint64(self.dim)).astype(np.int64)
            sign = np.where((th >> np.uint64(32)) & np.uint64(1), 1.0, -1.0)
            np.add.at(out, (parn, idx), sign)
        empty = np.bincount(parn, minlength=len(texts)) == 0
        out[empty, 0] = 1.0
        norms = np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)
        return (out / norms).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        emb = self._encode(texts)
        offs = pa.array(np.arange(0, (len(texts) + 1) * self.dim, self.dim,
                                  dtype=np.int32))
        col = pa.ListArray.from_arrays(offs, pa.array(emb.reshape(-1), pa.float32()))
        return pa.table({"doc_id": batch["doc_id"], "embedding": col})


def embed_docs(ds, *, dim: int = EMBED_DIM, batch_size: int = 2048,
               concurrency=(1, 4), num_gpus: float | None = None,
               device: str | None = None, num_cpus: float | None = None):
    """The embed actor pool with resource placement plumbed through:
    ``num_gpus`` reserves GPU slots per actor (reference ST1 runs one
    model per GPU; pass ``num_gpus=1, concurrency=n_gpus``), ``device``
    pins the framework device inside the actor.  CPU-only clusters just
    omit both."""
    kwargs = {}
    if num_gpus is not None:
        kwargs["num_gpus"] = num_gpus
    if num_cpus is not None:
        kwargs["num_cpus"] = num_cpus
    return ds.map_batches(
        EmbedDocs,
        fn_constructor_kwargs={"dim": dim, "batch_hint": batch_size,
                               "device": device},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, **kwargs)
