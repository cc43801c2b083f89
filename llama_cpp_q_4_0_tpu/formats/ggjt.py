"""GGJT model-file IO — the reference's on-disk contract.

Reads/writes the ggjt v3 container (and the older ggml/ggmf variants) used
by all five reference architectures.  Header schemas per arch:

  llama   (llama.cpp:432-440):  n_vocab n_embd n_mult n_head n_layer n_rot ftype
  gptneox (gptneox.cpp:459-467): n_vocab n_ctx n_embd n_head n_layer n_rot
                                 use_parallel_residual ftype
  falcon  (falcon.cpp:456-464):  n_vocab n_embd n_head n_layer parallel_attn ftype
  rwkv    (rwkv.cpp:528-537):    n_vocab n_ctx n_embd n_layer rescale_every ftype
  bonsai  (bonsai.cpp:453-461):  n_vocab n_embd n_head n_layer parallel_attn ftype

Vocab: n_vocab x {u32 len, bytes, f32 score}.  Tensors: {u32 n_dims, u32
name_len, u32 type, u32 ne[n_dims], name, pad-to-32, data}; ne[0] is the
fastest-varying (column/K) dim, so a 2-D tensor's numpy shape is
(ne[1], ne[0]).  Data is exposed as zero-copy np.memmap views (the TPU
analogue of llama_mmap, llama-util.h:166-266).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from ..quant.types import GGMLType, row_size_bytes, type_traits

MAGIC_GGML = 0x67676D6C  # 'ggml' — legacy, unversioned, no vocab scores
MAGIC_GGMF = 0x67676D66  # 'ggmf' v1
MAGIC_GGJT = 0x67676A74  # 'ggjt' v1/2/3 (mmap-aligned)

FILE_VERSION_GGML = 0
FILE_VERSION_GGMF_V1 = 1
FILE_VERSION_GGJT_V1 = 2
FILE_VERSION_GGJT_V2 = 3
FILE_VERSION_GGJT_V3 = 4

# header field order per architecture (after n_vocab, before ftype)
HEADER_FIELDS: dict[str, list[str]] = {
    "llama": ["n_vocab", "n_embd", "n_mult", "n_head", "n_layer", "n_rot"],
    "gptneox": ["n_vocab", "n_ctx", "n_embd", "n_head", "n_layer", "n_rot", "use_parallel_residual"],
    "falcon": ["n_vocab", "n_embd", "n_head", "n_layer", "parallel_attn"],
    "rwkv": ["n_vocab", "n_ctx", "n_embd", "n_layer", "rescale_every"],
    "bonsai": ["n_vocab", "n_embd", "n_head", "n_layer", "parallel_attn"],
}


@dataclass
class TensorEntry:
    name: str
    qtype: GGMLType
    ne: tuple[int, ...]  # ggml order: ne[0] = fastest (K)
    file_off: int
    size: int

    @property
    def shape(self) -> tuple[int, ...]:
        """numpy (row-major) shape."""
        return tuple(reversed(self.ne))

    @property
    def n_elements(self) -> int:
        return int(np.prod(self.ne))


@dataclass
class GGJTFile:
    path: str
    file_version: int
    arch: str
    hparams: dict[str, int]
    ftype: int
    vocab: list[tuple[bytes, float]]
    tensors: dict[str, TensorEntry]
    _mmap: np.memmap = field(repr=False, default=None)
    qk_k: int = 256  # super-block variant that wrote the file (k_quants.h:10)

    def tensor_bytes(self, name: str) -> np.ndarray:
        """Zero-copy uint8 view of a tensor's raw block data."""
        t = self.tensors[name]
        return self._mmap[t.file_off : t.file_off + t.size]

    def tensor_blocks(self, name: str) -> np.ndarray:
        """Structured block-dtype view (quantized) or float view (f16/f32)."""
        t = self.tensors[name]
        raw = self.tensor_bytes(name)
        tr = type_traits(t.qtype, self.qk_k)
        if t.qtype == GGMLType.F32:
            return raw.view("<f4").reshape(t.shape)
        if t.qtype == GGMLType.F16:
            return raw.view("<f2").reshape(t.shape)
        return raw.view(tr.block_dtype)

    def tensor_f32(self, name: str) -> np.ndarray:
        """Fully dequantized float32 tensor in numpy shape."""
        from ..quant.registry import dequantize

        t = self.tensors[name]
        blocks = self.tensor_blocks(name)
        if t.qtype in (GGMLType.F32, GGMLType.F16):
            return np.ascontiguousarray(blocks, dtype=np.float32)
        return dequantize(blocks, t.qtype, self.qk_k).reshape(t.shape)


def _read_header(f, arch: str):
    fields = HEADER_FIELDS[arch]
    vals = struct.unpack(f"<{len(fields)}I", f.read(4 * len(fields)))
    hparams = dict(zip(fields, vals))
    (ftype,) = struct.unpack("<I", f.read(4))
    return hparams, ftype


def read_ggjt(path: str | Path, arch: str = "llama",
              qk_k: int | None = None) -> GGJTFile:
    """Parse a ggml/ggmf/ggjt file.

    ``qk_k`` selects the k-quant super-block variant the file was written
    with (the reference's compile-time GGML_QKK_64, k_quants.h:10-16).  The
    container carries no marker, but the variants' block byte-sizes differ,
    so the wrong choice derails tensor offsets — when qk_k is None we parse
    as 256 and fall back to 64 if the stream misparses (a 64-variant file
    read as 256 hits a divisibility error, a garbage tensor header, or a
    final-offset mismatch with probability ~1)."""
    if qk_k is None:
        try:
            return _read_ggjt(path, arch, 256)
        except (ValueError, struct.error, UnicodeDecodeError) as e256:
            try:
                return _read_ggjt(path, arch, 64)
            except (ValueError, struct.error, UnicodeDecodeError):
                # neither variant parses: the file is corrupt/mis-arch'd,
                # not a QK_K mismatch — surface the original error
                raise e256 from None
    return _read_ggjt(path, arch, qk_k)


def _read_ggjt(path: str | Path, arch: str, qk_k: int) -> GGJTFile:
    path = str(path)
    with open(path, "rb") as f:
        (magic,) = struct.unpack("<I", f.read(4))
        if magic == MAGIC_GGML:
            file_version = FILE_VERSION_GGML
        else:
            (version,) = struct.unpack("<I", f.read(4))
            if magic == MAGIC_GGMF and version == 1:
                file_version = FILE_VERSION_GGMF_V1
            elif magic == MAGIC_GGJT and version in (1, 2, 3):
                file_version = FILE_VERSION_GGJT_V1 + version - 1
            else:
                raise ValueError(
                    f"unknown (magic, version): {magic:08x}, is this a GGML file?"
                )

        hparams, ftype = _read_header(f, arch)
        n_vocab = hparams["n_vocab"]
        if not (0 < n_vocab < 10_000_000):
            raise ValueError(f"implausible n_vocab={n_vocab}; wrong arch schema?")

        vocab = []
        # rwkv files carry no vocab scores (rwkv.cpp:546-549 comments them out)
        has_scores = arch != "rwkv" and file_version >= FILE_VERSION_GGMF_V1
        for _ in range(n_vocab):
            (ln,) = struct.unpack("<I", f.read(4))
            word = f.read(ln)
            score = 0.0
            if has_scores:
                (score,) = struct.unpack("<f", f.read(4))
            vocab.append((word, score))

        file_size = Path(path).stat().st_size
        tensors: dict[str, TensorEntry] = {}
        while f.tell() < file_size:
            hdr = f.read(12)
            if len(hdr) < 12:
                raise ValueError("truncated tensor header (wrong QK_K?)")
            n_dims, name_len, ttype = struct.unpack("<3I", hdr)
            if not (1 <= n_dims <= 4) or name_len > 4096:
                raise ValueError("implausible tensor header (wrong QK_K?)")
            ne = struct.unpack(f"<{n_dims}I", f.read(4 * n_dims))
            name = f.read(name_len).decode("utf-8")
            qtype = GGMLType(ttype)
            if file_version >= FILE_VERSION_GGJT_V1:
                f.seek(-f.tell() & 31, 1)  # align to 32
            size = row_size_bytes(qtype, int(np.prod(ne)), qk_k)
            off = f.tell()
            tensors[name] = TensorEntry(name, qtype, tuple(ne), off, size)
            f.seek(size, 1)
        if f.tell() != file_size:
            raise ValueError("tensor data overruns file (wrong QK_K?)")

    mm = np.memmap(path, dtype=np.uint8, mode="r")
    return GGJTFile(path, file_version, arch, hparams, ftype, vocab, tensors,
                    mm, qk_k=qk_k)


def detect_arch(path: str | Path) -> str:
    """Guess the architecture from header plausibility + first tensor names.

    The reference has no arch tag in the file (one binary per arch); we
    sniff instead so one CLI serves all five model families.  Note: falcon
    and bonsai files are byte-compatible (same header schema and tensor
    names — bonsai is a falcon-shaped checkpoint run with different
    norm/activation semantics), so this returns "falcon" for both; pass
    --arch bonsai explicitly for bonsai checkpoints.
    """
    markers = {
        "llama": ("tok_embeddings.weight", "layers.0.attention.wq.weight"),
        "gptneox": ("gpt_neox.embed_in.weight",),
        "falcon": ("transformer.word_embeddings.weight",),
        "rwkv": ("rwkv.embeddings.weight",),  # rwkv.cpp:130
        "bonsai": ("transformer.wte.weight", "model.embed_tokens.weight"),
    }
    for arch in HEADER_FIELDS:
        try:
            gf = read_ggjt(path, arch)
        except Exception:
            continue
        names = gf.tensors.keys()
        if any(m in names for m in markers[arch]):
            return arch
    raise ValueError(f"cannot detect architecture of {path}")


class GGJTWriter:
    """Streaming ggjt writer (llama_file_saver, llama.cpp:510-566).

    llama files are ggjt v3; the arch forks read/write ggjt v1 with modern
    block formats (gptneox.cpp:452/622, rwkv.cpp:622) — version defaults
    accordingly."""

    def __init__(self, path: str | Path, arch: str, hparams: dict[str, int], ftype: int,
                 vocab: list[tuple[bytes, float]], version: int | None = None,
                 qk_k: int = 256):
        if version is None:
            version = 3 if arch == "llama" else 1
        self.f = open(path, "wb")
        self.arch = arch
        self.qk_k = qk_k
        self.f.write(struct.pack("<II", MAGIC_GGJT, version))
        fields = HEADER_FIELDS[arch]
        self.f.write(struct.pack(f"<{len(fields)}I", *[hparams[k] for k in fields]))
        self.f.write(struct.pack("<I", ftype))
        for word, score in vocab:
            if isinstance(word, str):
                word = word.encode("utf-8")
            self.f.write(struct.pack("<I", len(word)))
            self.f.write(word)
            if arch != "rwkv":  # rwkv vocab has no scores (rwkv.cpp:546)
                self.f.write(struct.pack("<f", score))

    def write_tensor(self, name: str, qtype: GGMLType, ne: tuple[int, ...], data: bytes):
        assert len(data) == row_size_bytes(qtype, int(np.prod(ne)), self.qk_k)
        nb = name.encode("utf-8")
        self.f.write(struct.pack("<3I", len(ne), len(nb), int(qtype)))
        self.f.write(struct.pack(f"<{len(ne)}I", *ne))
        self.f.write(nb)
        self.f.write(b"\x00" * (-self.f.tell() & 31))
        self.f.write(data)

    def close(self):
        self.f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
