"""morph-xr2rml-spark: a PySpark-native xR2RML knowledge-graph
construction engine.

Compiles xR2RML mapping documents (a superset of W3C R2RML / RML) into
Spark DataFrame plans that materialize RDF triples at scale — the
Spark-first re-implementation of the capabilities of
fpriyatna/morph-xr2rml (reference at /root/reference, studied for
semantics only; no code is ported).
"""

from .model import MappingDocument
from .translate import EngineConfig

__all__ = ["MappingDocument", "EngineConfig"]
__version__ = "0.2.0"
