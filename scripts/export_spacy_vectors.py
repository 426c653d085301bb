"""Export spaCy en_core_web_md word vectors for the VG label vocabulary.

Run this on a machine WITH spaCy + the md model installed, then ship the
.npz to the training hosts and set SPATIALTHINKER_SEMSIM_TABLE=<path>:
the reward's TableBackend then scores label similarity with the exact
vectors the reference uses (/root/reference/verl/utils/reward_score/
spatial_sgg.py:12-39) with no spaCy runtime dependency on the TPU host.

    python scripts/export_spacy_vectors.py out.npz [extra_vocab.txt]

The default vocabulary is the curated VG word list in rewards/vg_table.py
(objects + predicates, split into single words — TableBackend averages word
vectors for multi-word labels exactly like spaCy docs do); pass a text file
of one label per line to extend it (e.g. your dataset's label inventory).
"""

from __future__ import annotations

import sys


def main() -> None:
    import numpy as np
    import spacy

    out_path = sys.argv[1] if len(sys.argv) > 1 else "vg_vectors.npz"
    words = set()
    from spatialthinker_tpu.rewards.vg_table import WORD_FEATURES

    for label in WORD_FEATURES:
        words.update(label.split())
    if len(sys.argv) > 2:
        with open(sys.argv[2]) as f:
            for line in f:
                words.update(line.strip().lower().replace("_", " ").replace("-", " ").split())

    nlp = spacy.load("en_core_web_md", disable=["parser", "ner", "tagger"])
    kept, vecs = [], []
    for w in sorted(words):
        lex = nlp.vocab[w]
        if lex.has_vector:
            kept.append(w)
            vecs.append(lex.vector)
    np.savez_compressed(out_path, words=np.array(kept), vectors=np.stack(vecs))
    print(f"wrote {len(kept)} vectors ({len(words) - len(kept)} OOV skipped) to {out_path}")


if __name__ == "__main__":
    main()
