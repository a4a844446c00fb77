"""doctr_spark — a PySpark-native document-text extraction engine.

A from-scratch reimplementation of the query/data-processing capabilities of
mindee/doctr (reference at /root/reference) as an idiomatic Spark batch job:

* input: a table of multi-turn transcripts
  ``(conv_id string, turn_idx int, role string, text string, tool string, ts timestamp)``
  whose ``text`` field may embed renderable payloads (HTML fragments, packed
  image/PDF bytes),
* pipeline: payload decode -> text detection -> crop explode -> text
  recognition -> document reconstruction (docTR's Word->Line->Block->Page
  nesting), every heavy stage a vectorized Arrow/pandas UDF — no per-row
  Python,
* output: per-turn ``extracted_text`` equal to the reference pipeline's
  ``Document.render()`` under stable ``(conv_id, turn_idx)`` ordering, plus
  the full nested page export.

The container has no torch/cv2, so the two NN forward passes are
deterministic computational stand-ins (a glyph-bitmap "renderer" and
matching logit emitter); everything around them — the DBNet-style
binarize->connected-components->box postprocess, CTC best-path decoding,
crop splitting/merging, and the DocumentBuilder geometry heuristics — is a
real reimplementation of the reference semantics (cited per function).
"""

__version__ = "0.1.0"
