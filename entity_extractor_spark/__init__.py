"""entity_extractor_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the
reference `sabahshaikh03/entity-extractor` service (see SURVEY.md).

Not a port: the reference is a row-at-a-time threaded Python ETL service;
this package re-expresses its computed semantics (mention detection, triple
extraction, entity linking, canonicalization, PFAS-status propagation,
checkpoint/resume) as set-oriented Spark DataFrame stages designed for a
multi-executor cluster at 10^12-document scale, tested on local[N].
"""

__version__ = "0.1.0"
