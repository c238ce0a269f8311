"""packages_sgml_spark — a PySpark-native SGML/XML/HTML parsing and
web-text extraction engine.

Reimplements the parsing semantics of SWI-Prolog's ``packages-sgml``
(reference snapshot at /root/reference, studied for behaviour only) as:

- a pure-Python, semantics-faithful parser core (``core/``) usable
  inside vectorized Arrow/pandas UDFs, and
- Spark DataFrame operators (``spark/``) for extraction, node-table
  querying, dedup, text analysis, and pipeline plumbing at
  Common-Crawl scale.

Nothing here is a code port: the reference is a char-at-a-time C FSM;
this package re-expresses the same *observable semantics* (DOM shape,
extracted text bytes, error messages) in idiomatic Python/Spark.
"""

__version__ = "0.1.0"
