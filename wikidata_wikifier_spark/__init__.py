"""PySpark-native knowledge-graph construction / wikification engine.

A from-scratch re-expression of the capabilities of
usc-isi-i2/wikidata-wikifier (reference: /root/reference) as an idiomatic
Spark DataFrame pipeline:

- mention detection over a source table (vectorized, no per-row Python)
- candidate generation against a broadcast label/alias index
  (exact / edge-ngram / trigram / fuzzy — the reference's four `tl`
  retrieval strategies, wikifier/wikifier.py:81-113)
- feature computation (string sims, singleton, context match, kth
  percentile, semantic TF-IDF, embedding centroid — wikifier.py:148-210)
- MLP re-ranking (numpy forward pass in a pandas UDF,
  contrastive_model.py:26-55)
- windowed top-k link selection + join-back (wikifier.py:216-224)
- connected-components canonicalization and (subj,pred,obj) triple
  materialization with per-partition lineage + resume.

Plus first-class large-scale training-data ops: dedup (exact / MinHash-LSH /
SimHash / ngram-Jaccard / embedding-cosine), ANN similarity search, text
quality analysis, and multimodal column plumbing.
"""

__version__ = "0.1.0"
