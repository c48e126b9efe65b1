"""Running PUBLISHED tokenizers over a corpus (round 10).

Three interop surfaces a pretraining data team needs beyond training
its own tokenizer (example 16):

1. LLAMA-3 FILES — a real Llama-3-family ``tokenizer.json`` ships
   ``pre_tokenizer: Sequence[Split(<cl100k regex>, Isolated),
   ByteLevel(add_prefix_space=false, use_regex=false)]`` with an
   ``ignore_merges`` BPE model.  ``import_hf_tokenizer_json`` composes
   that Sequence onto the engine's per-word transforms (the Split is a
   hand-rolled scanner, fuzz-pinned exact against the ``regex``
   library; anything it cannot compose raises LOUDLY), and
   ``hf_tokenizer_encode`` runs it as the zero-shuffle map pass.
2. SENTENCEPIECE-UNIGRAM LIFECYCLE — ``unigram_lm_fit(
   pre_tokenizer=Metaspace)`` trains the vocabulary in ▁-space (the
   form real Llama-1/2 tokenizers are trained in; the corpus is still
   scanned exactly once), exports as a HF Unigram file, imports back,
   and encodes.
3. SPECIAL TOKENS — corpora scraped from the web can carry literal
   ``<|endoftext|>``-style strings.  ``contains_special_tokens``
   detects them with a pure-codegen filter (no UDF — rides the scan at
   100 TB), and ``hf_tokenizer_encode(special_tokens='split')``
   replays HF's added-token extraction when you WANT the HF behavior.

Run: python examples/17_published_tokenizers.py [sf_dir]
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from elusion_spark import (
    contains_special_tokens,
    export_hf_tokenizer_json,
    get_spark,
    hf_tokenizer_encode,
    import_hf_tokenizer_json,
    unigram_lm_fit,
)
from elusion_spark.operators.tokenizer_io import _LLAMA3_SPLIT_REGEX

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("ex17")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
    "doc_id", "text")

# -- 1. a Llama-3-shaped file through the front door --------------------
llama3 = {
    "version": "1.0", "normalizer": None,
    "added_tokens": [],
    "pre_tokenizer": {"type": "Sequence", "pretokenizers": [
        {"type": "Split", "pattern": {"Regex": _LLAMA3_SPLIT_REGEX},
         "behavior": "Isolated", "invert": False},
        {"type": "ByteLevel", "add_prefix_space": False,
         "trim_offsets": True, "use_regex": False}]},
    "model": {"type": "BPE", "unk_token": None, "ignore_merges": True,
              "vocab": {s: i for i, s in enumerate(
                  list("abcdefghijklmnopqrstuvwxyz") + ["Ġ", "Ġthe"])},
              "merges": []},
}
p1 = os.path.join(tempfile.mkdtemp(), "llama3_shaped.json")
json.dump(llama3, open(p1, "w"))
m1 = import_hf_tokenizer_json(p1)
print("== 1. Llama-3 Sequence[Split, ByteLevel] import ==")
print("parsed pre_tokenizer:", m1["pre_tokenizer"],
      "| ignore_merges:", m1["ignore_merges"])
hf_tokenizer_encode(docs, "text", m1).select(
    "doc_id", "n_tokens", F.slice("tokens", 1, 6).alias("first")).show(
    3, truncate=False)

# -- 2. the SentencePiece-unigram lifecycle ------------------------------
ms = {"type": "Metaspace", "replacement": "▁",
      "prepend_scheme": "always"}
model = unigram_lm_fit(docs, "text", vocab_size=300, max_piece_len=4,
                       em_iters=2, pre_tokenizer=ms)
p2 = os.path.join(tempfile.mkdtemp(), "sp_unigram.json")
export_hf_tokenizer_json(p2, unigram_model=model, lowercase=True,
                         pre_tokenizer=ms)
m2 = import_hf_tokenizer_json(p2)
print("== 2. unigram fit-in-▁-space → export → import → encode ==")
print(f"{len(model)} pieces; top:",
      [m["piece"] for m in model[:8]])
hf_tokenizer_encode(docs, "text", m2).select(
    "doc_id", "n_tokens", F.slice("tokens", 1, 6).alias("first")).show(
    3, truncate=False)

# -- 3. special tokens: detect, then opt into the HF behavior -----------
tainted = docs.withColumn(
    "text",
    F.when(F.col("doc_id") % 100 == 0,
           F.concat(F.lit("<|endoftext|>"), F.col("text")))
    .otherwise(F.col("text")))
spec = {
    "version": "1.0", "normalizer": None,
    "pre_tokenizer": {"type": "WhitespaceSplit"},
    "added_tokens": [{"content": "<|endoftext|>", "special": True}],
    "model": {"type": "BPE", "unk_token": None, "vocab": {},
              "merges": []},
}
p3 = os.path.join(tempfile.mkdtemp(), "with_special.json")
json.dump(spec, open(p3, "w"))
m3 = import_hf_tokenizer_json(p3)
print("== 3. contains_special_tokens (pure codegen) ==")
hits = contains_special_tokens(tainted, "text", m3)
hits.agg(
    F.count("*").alias("docs"),
    F.sum(F.size("special_token_hits")).alias("docs_with_hits")).show()
enc = hf_tokenizer_encode(tainted, "text", m3, special_tokens="split")
print("split mode keeps the special whole:")
enc.filter(F.col("doc_id") % 100 == 0).select(
    "doc_id", F.slice("tokens", 1, 3).alias("first")).show(
    2, truncate=False)

# -- 4. the id-stream tail: ids → packed training rows → decode ---------
from elusion_spark import hf_tokenizer_decode, pack_token_ids  # noqa: E402

ids = hf_tokenizer_encode(docs, "text", m1, with_ids=True)
packed = pack_token_ids(ids, "token_ids", seq_len=512,
                        id_col="doc_id", eos_id=0, n_shards=8)
print("== 4. pack_token_ids (512-id training rows, 8 shards) ==")
packed.agg(F.count("*").alias("sequences"),
           F.sum(F.size("ids")).alias("ids_packed")).show()
dec = hf_tokenizer_decode(ids, "token_ids", m1, from_ids=True)
print("decode(ids) reconstructs the text (ByteLevel inverse):")
dec.select("doc_id", F.substring("decoded", 1, 48).alias("head")).show(
    2, truncate=False)
print("published-tokenizer interop complete.")
