"""Generate the bundled English WordPiece vocab from the CLIP BPE data.

The reference gets BERT's ``vocab.txt`` from the HuggingFace wheel at
runtime (``ldm/modules/encoders/modules.py:173`` — ``BertTokenizerFast
.from_pretrained('bert-base-uncased')``). This image has no network egress,
so instead of shipping Google's file we DERIVE a 30,522-entry WordPiece
vocab from the one published tokenizer artifact already bundled in-tree:
CLIP's BPE merges (``text/data/bpe_simple_vocab_16e6.txt.gz``, the same
data the reference vendors at ``open_clap/bpe_simple_vocab_16e6.txt.gz``).

Layout mirrors bert-base-uncased so special-token ids line up ([PAD]=0,
[UNK]=100, [CLS]=101, [SEP]=102, [MASK]=103):

  0        [PAD]
  1-99     [unused0]..[unused98]
  100-103  [UNK] [CLS] [SEP] [MASK]
  then     every single ASCII char piece + its ## form (no-UNK guarantee
           for any lowercase-alnum word), then CLIP subwords in merge-
           frequency order, each as a word-initial piece and a ##
           continuation, until exactly 30,522 lines.

Token IDS do NOT match bert-base-uncased (that mapping is Google's trained
artifact); a model trained in THIS framework with this vocab is fully
coherent, and checkpoint imports that need HF-BERT id parity must wire the
original ``vocab.txt`` via ``--vocab`` (the torch importer warns).

Usage:  python tools/build_wordpiece_vocab.py   (writes
        audiogpt_tpu/text/data/wordpiece_en.txt.gz, deterministic)
"""

from __future__ import annotations

import gzip
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TARGET_SIZE = 30522  # bert-base-uncased table size == BertConfig.vocab_size


def build_vocab() -> list[str]:
    from audiogpt_tpu.text.bpe import CLIP_BPE_PATH

    lines = gzip.open(CLIP_BPE_PATH).read().decode("utf-8").split("\n")
    merges = [tuple(line.split()) for line in lines[1 : 48894 + 1]]

    vocab: list[str] = ["[PAD]"]
    vocab += [f"[unused{i}]" for i in range(99)]
    vocab += ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]

    seen = set(vocab)

    def add(tok: str) -> None:
        if tok and tok not in seen and len(vocab) < TARGET_SIZE:
            seen.add(tok)
            vocab.append(tok)

    # single-char pieces: lowercase alnum + ASCII punctuation (the encode
    # regex lowercases and splits [a-z0-9]+ | one non-alnum char, so this
    # set guarantees no [UNK] on plain English)
    chars = "abcdefghijklmnopqrstuvwxyz0123456789"
    punct = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"
    for c in chars:
        add(c)
        add("##" + c)
    for c in punct:
        add(c)  # punctuation is always its own word — no ## form needed

    # CLIP subwords in merge order (≈ corpus frequency order). A token with
    # '</w>' occurs at word end (plain form = whole word / word-initial
    # match; ## form = word-final continuation); one without occurs at word
    # start or middle (plain = prefix, ## = middle). Greedy longest-match
    # WordPiece uses both forms, so emit both, frequency-interleaved.
    for a, b in merges:
        s = (a + b).replace("</w>", "")
        if not s or not all(ch in chars for ch in s):
            continue  # punctuation-bearing merges don't survive the word split
        add(s)
        add("##" + s)
        if len(vocab) >= TARGET_SIZE:
            break

    assert len(vocab) == TARGET_SIZE, len(vocab)
    return vocab


def main() -> None:
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "audiogpt_tpu", "text", "data", "wordpiece_en.txt.gz")
    vocab = build_vocab()
    # mtime=0 → deterministic bytes (artifact is committed)
    with open(out, "wb") as raw:
        with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as f:
            f.write(("\n".join(vocab) + "\n").encode("utf-8"))
    print(f"wrote {out}: {len(vocab)} entries")


if __name__ == "__main__":
    main()
