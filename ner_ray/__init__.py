"""ner_ray — a Ray-Data-native knowledge-graph construction engine.

From-scratch re-expression of the capabilities of the NJUDCA/NER reference
(Chinese BiLSTM-CRF / BERT NER taggers; see SURVEY.md) lifted into a full KG
build over Parquet transcript tables:

    read_parquet(transcripts)                  [sources.transcripts / B1]
    -> salted order restore per conv_id        [stages.order_restore / B2]
    -> mention detection (actor pool taggers)  [stages.tagger / B3, M1-M10, E1]
    -> windowed triple extraction              [stages.triples / B4]
    -> entity linking (broadcast alias dict)   [stages.linker / B5]
    -> canonicalization (distributed UF)       [stages.canonicalize / B6]
    -> exact dedup                             [stages.dedup / B7]
    -> partitioned Parquet + lineage manifest  [stages.materialize / B8-B10]

Everything is expressed on ray.data.Dataset with zero-copy Arrow batches;
stateful stages are callable-class actor pools. No reference code is copied
(/root/reference was empty at build time — SURVEY.md §0); reference-side
semantics (char normalization, BIO folding, Viterbi decode) are re-implemented
from the public description of that model family.
"""

__version__ = "0.1.0"
