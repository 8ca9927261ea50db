"""PySpark-native entity-resolution / document-enrichment engine.

A from-scratch re-creation of the capabilities of the Rosette
Elasticsearch ingest plugin (``rosette-api/rosette-elasticsearch-plugin``,
studied read-only at ``/root/reference``) expressed Spark-first:

* enrichment processors (language, categories, sentiment, name
  translation, entities) become ``withColumn`` / ``applyInPandas``
  stages over a DataFrame of interleaved text+media documents
  (cf. reference ``RosetteAbstractProcessor.java:44-68``);
* entity *resolution* — which the reference delegates to the Rosette
  kb-linker (``entities_response.json`` ``"source":"kb-linker"``) — is
  built natively: blocking (normalized-name + Double Metaphone +
  MinHash-LSH), vectorized pairwise scoring (Jaro-Winkler /
  Levenshtein / token-Jaccard in Arrow-batched pandas UDFs) and
  iterative hash-min connected components.

Design stance: pure ``pyspark.sql`` DataFrame ops wherever possible so
Catalyst can push filters/prune columns; Arrow pandas UDFs only where
built-ins genuinely cannot express the semantics (phonetics,
Jaro-Winkler). No RDDs, no per-row Python.
"""

__version__ = "0.1.0"
