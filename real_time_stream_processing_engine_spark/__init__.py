"""PySpark-native analytics engine with the capabilities of
``dhanush-suresh/Real-Time-Stream-Processing-Engine`` (RainStorm).

The reference is a hand-rolled distributed stream processor (SWIM-ish
membership + HyDFS replicated file store + a two-stage leader-scheduled
dataflow, ``/root/reference/file_system/src/main/java/com/file_system``).
This package re-expresses its *capabilities* Spark-first:

- membership / failure detection / HyDFS  -> Spark cluster manager + real FS
- the operator surface (``Operators.java:13-19``) -> a registry of pure
  ``DataFrame -> DataFrame`` transforms (:mod:`.operators.core`)
- the ``RAINSTORM op1 op2 file numTasks`` command surface
  (``Node.java:355-486``) -> :mod:`.operators.parser`
- at-least-once tuple delivery + retry (``Node.java:915-1085``) ->
  Structured Streaming checkpointing (exactly-once, strictly stronger)

plus the large-scale training-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal columns) that a 100 TB deployment needs.
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
