"""data_ingestor_and_features_creator_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capability surface of
``Aura-healthcare/data_ingestor_and_features_creator`` (see SURVEY.md §0:
the reference checkout is empty this session, so semantics derive from the
org's public ``hrvanalysis`` API surface, tagged [PK:*] in SURVEY.md §2),
plus the LLM-data-pipeline operator set (dedup, similarity search,
multimodal columns, text analysis) mandated by BASELINE.json.

Architecture: declarative DataFrame/SQL plans handed to Catalyst; pandas
UDFs (Arrow-batched) only where built-ins cannot express the semantics
(frequency-domain PSD, sample entropy, binary decode). No RDDs, no
driver-side loops over data.
"""

__version__ = "0.1.0"
