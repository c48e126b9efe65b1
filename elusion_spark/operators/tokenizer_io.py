"""Tokenizer model persistence + HuggingFace-interop export
(VERDICT r7 stretch #7).

Native formats mirror ``unigram_lm_save`` (one JSON file, format tag,
driver-sized).  ``export_hf_tokenizer_json`` additionally writes the
model in the shape of HuggingFace ``tokenizer.json`` so downstream
training stacks can consume an engine-trained tokenizer directly with
``tokenizers.Tokenizer.from_file`` — round-trip-tested against the
``tokenizers`` library when it is installed (gated; it is not baked
into this container).

Caveat stated honestly: the engine's tokenizers are whitespace-
pre-tokenized and (optionally) lowercased, so the export pins exactly
that pipeline (``WhitespaceSplit`` + ``Lowercase``); models trained
with different pre-tokenization are out of scope.
"""

from __future__ import annotations

import json


def bpe_save(merges: list[dict], path: str) -> None:
    """Persist a ``bpe_fit`` merge list as one JSON file (driver-sized:
    one row per merge)."""
    with open(path, "w") as f:
        json.dump({"format": "elusion_bpe_v1", "merges": merges}, f)


def bpe_load(path: str) -> list[dict]:
    with open(path) as f:
        d = json.load(f)
    if d.get("format") != "elusion_bpe_v1":
        raise ValueError(f"not a BPE model file: {path}")
    return d["merges"]


def _bpe_vocab_from_merges(merges: list[dict]) -> dict[str, int]:
    """HF-style id assignment: the base alphabet (every character that
    appears in any merge side) sorted, then each merge's output symbol
    in rank order — the construction HF's BPE trainer uses, so ids are
    deterministic given the merge list."""
    alphabet = sorted({c for m in merges for c in m["lft"] + m["rgt"]})
    vocab = {c: i for i, c in enumerate(alphabet)}
    for m in merges:
        # sides first: no-op for well-formed (bpe_fit) lists where each
        # side is a base char or an earlier output, but keeps the
        # export loadable (HF requires merge sides in-vocab) if a
        # caller hands a truncated/hand-built list
        for sym in (m["lft"], m["rgt"], m["lft"] + m["rgt"]):
            if sym not in vocab:
                vocab[sym] = len(vocab)
    return vocab


def export_hf_tokenizer_json(
    path: str,
    *,
    bpe_merges: list[dict] | None = None,
    unigram_model: list[dict] | None = None,
    lowercase: bool = True,
    byte_fallback: bool = False,
) -> dict:
    """Write a HuggingFace ``tokenizer.json``-shaped file for EITHER a
    ``bpe_fit`` merge list OR a ``unigram_lm_fit`` model (exactly one).
    Returns the dict that was written.

    - BPE: ``model.type = "BPE"`` with the merge list as the canonical
      ``["lft rgt", ...]`` strings and a derived vocab (see
      ``_bpe_vocab_from_merges``).
    - Unigram: ``model.type = "Unigram"`` with ``vocab = [[piece,
      logprob], ...]`` in the model's order and ``byte_fallback``
      mirrored from the encode-time knob; when set, the 256 ``<0xNN>``
      pieces are appended (HF requires them in-vocab) at a logprob
      below every real piece, matching SentencePiece's convention.
    """
    if (bpe_merges is None) == (unigram_model is None):
        raise ValueError(
            "pass exactly one of bpe_merges / unigram_model")
    out: dict = {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "added_tokens": [],
        "normalizer": {"type": "Lowercase"} if lowercase else None,
        "pre_tokenizer": {"type": "WhitespaceSplit"},
        "post_processor": None,
        "decoder": None,
    }
    if bpe_merges is not None:
        vocab = _bpe_vocab_from_merges(bpe_merges)
        out["model"] = {
            "type": "BPE",
            "dropout": None,
            "unk_token": None,
            "continuing_subword_prefix": None,
            "end_of_word_suffix": None,
            "fuse_unk": False,
            "byte_fallback": False,
            "ignore_merges": False,
            "vocab": vocab,
            "merges": [f'{m["lft"]} {m["rgt"]}' for m in bpe_merges],
        }
    else:
        pieces = [[m["piece"], float(m["logprob"])]
                  for m in unigram_model]
        if byte_fallback:
            have = {p for p, _ in pieces}
            floor_lp = min(lp for _, lp in pieces) - 10.0
            pieces += [[f"<0x{b:02X}>", floor_lp] for b in range(256)
                       if f"<0x{b:02X}>" not in have]
        out["model"] = {
            "type": "Unigram",
            "unk_id": None,
            "vocab": pieces,
            "byte_fallback": bool(byte_fallback),
        }
    with open(path, "w") as f:
        json.dump(out, f)
    return out


def import_hf_tokenizer_json(path: str) -> dict:
    """Load a HuggingFace ``tokenizer.json`` into engine-native model
    form — the other half of the interop: run a PUBLISHED tokenizer
    over a 100 TB corpus with the engine's encode paths.

    Returns ``{"kind": "bpe", "merges": [...], "lowercase": bool}``
    (feed ``merges`` to ``bpe_encode``) or ``{"kind": "unigram",
    "model": [...], "byte_fallback": bool, "lowercase": bool}`` (feed
    ``model`` to ``unigram_lm_encode``).  ``lowercase`` reflects the
    file's normalizer (only ``Lowercase``/none map exactly; any other
    normalizer raises rather than silently diverging).  HF byte pieces
    ``<0xNN>`` in a unigram vocab are preserved verbatim — they are
    exactly what ``byte_fallback_tokens`` emits, so encodes line up.

    Round-trips bit-exactly with ``export_hf_tokenizer_json`` (tested
    without the ``tokenizers`` library; the gated lib test covers
    foreign files)."""
    with open(path) as f:
        d = json.load(f)
    norm = d.get("normalizer")
    if norm is None:
        lowercase = False
    elif isinstance(norm, dict) and norm.get("type") == "Lowercase":
        lowercase = True
    else:
        raise ValueError(
            f"unsupported normalizer {norm!r}: only Lowercase/none map "
            "exactly onto the engine's encode paths")
    model = d.get("model") or {}
    mtype = model.get("type")
    if mtype == "BPE":
        merges = []
        for i, m in enumerate(model.get("merges", [])):
            if isinstance(m, str):      # "lft rgt" canonical form
                lft, _, rgt = m.partition(" ")
            else:                       # newer HF also allows pairs
                lft, rgt = m
            merges.append({"merge_rank": i + 1, "lft": lft, "rgt": rgt,
                           "pair_count": 0})
        return {"kind": "bpe", "merges": merges, "lowercase": lowercase}
    if mtype == "Unigram":
        pieces = [{"piece": p, "logprob": float(lp)}
                  for p, lp in model.get("vocab", [])]
        return {"kind": "unigram", "model": pieces,
                "byte_fallback": bool(model.get("byte_fallback", False)),
                "lowercase": lowercase}
    raise ValueError(f"unsupported model type {mtype!r} in {path}")
