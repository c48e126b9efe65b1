#!/usr/bin/env python
"""Round-10 tokenizer-tail slope study: the Llama-3-shaped Sequence
encode, id emission, decode, and sequence packing at sf0.1 vs the 10x
documents fixture (/tmp/scale10).

What the ratios isolate: all four paths are zero- or two-shuffle map
shapes whose python cost is per-distinct-word (encode, via the
per-task memo) or per-token-linear (ids/decode Arrow round-trip, pack
slice exchange) — so the 10x wall should scale ~linearly in corpus
size, with the encode sub-linear when the distinct-word table
saturates (Heaps' law; the synthetic corpus saturates early).

Run on an idle machine: python tools/llama3_scale.py
Prints one JSON line; numbers go to SCALE.md round 10.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from elusion_spark import get_spark  # noqa: E402
from elusion_spark.operators.tokenizer_io import (  # noqa: E402
    _LLAMA3_SPLIT_REGEX, hf_tokenizer_decode, hf_tokenizer_encode,
    import_hf_tokenizer_json)
from elusion_spark.pipeline import pack_token_ids  # noqa: E402


def _min2(fn):
    walls = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        walls.append(round(time.perf_counter() - t0, 3))
    return min(walls)


def _llama3_model() -> dict:
    vocab = {s: i for i, s in enumerate(
        [chr(c) for c in range(33, 127)] + ["Ġ"]
        + ["Ġthe", "Ġdata", "Ġs", "Ġsc", "an"])}
    doc = {
        "version": "1.0", "normalizer": None, "added_tokens": [],
        "pre_tokenizer": {"type": "Sequence", "pretokenizers": [
            {"type": "Split",
             "pattern": {"Regex": _LLAMA3_SPLIT_REGEX},
             "behavior": "Isolated", "invert": False},
            {"type": "ByteLevel", "add_prefix_space": False,
             "trim_offsets": True, "use_regex": False}]},
        "model": {"type": "BPE", "unk_token": None,
                  "ignore_merges": True, "vocab": vocab,
                  "merges": ["Ġ s", "Ġs c", "a n"]},
    }
    fd, path = tempfile.mkstemp(suffix=".json", prefix="l3scale_")
    with os.fdopen(fd, "w") as f:
        json.dump(doc, f)
    return import_hf_tokenizer_json(path)


def main() -> None:
    spark = get_spark("llama3_scale")
    model = _llama3_model()
    out: dict = {}
    for label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"),
                          ("10x", "/tmp/scale10")):
        if not os.path.exists(f"{sf_dir}/documents.parquet"):
            out[label] = "fixture missing"
            continue
        d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text")
        n = d.count()

        def noop(df):
            df.write.format("noop").mode("overwrite").save()

        enc = hf_tokenizer_encode(d, "text", model)
        enc_ids = hf_tokenizer_encode(d, "text", model, with_ids=True)
        noop(enc)   # warm
        res = {
            "docs": n,
            "encode": _min2(lambda: noop(
                hf_tokenizer_encode(d, "text", model))),
            "encode_ids": _min2(lambda: noop(
                hf_tokenizer_encode(d, "text", model, with_ids=True))),
            "decode": _min2(lambda: noop(hf_tokenizer_decode(
                hf_tokenizer_encode(d, "text", model), "tokens",
                model))),
            "pack": _min2(lambda: noop(pack_token_ids(
                hf_tokenizer_encode(d, "text", model, with_ids=True),
                "token_ids", seq_len=2048, id_col="doc_id",
                eos_id=0, n_shards=64))),
        }
        out[label] = res
    if (isinstance(out.get("sf0.1"), dict)
            and isinstance(out.get("10x"), dict)):
        out["ratio_10x"] = {
            k: round(out["10x"][k] / out["sf0.1"][k], 2)
            for k in ("encode", "encode_ids", "decode", "pack")}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
