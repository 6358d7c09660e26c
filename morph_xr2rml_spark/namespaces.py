"""RDF / R2RML / RML / xR2RML vocabulary constants.

Mirrors the vocabulary handled by the reference implementation
(/root/reference/morph-core/.../Constants.scala) — public W3C / xR2RML IRIs.
"""

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF + "type"
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"
RDF_LIST = RDF + "List"
RDF_BAG = RDF + "Bag"
RDF_SEQ = RDF + "Seq"
RDF_ALT = RDF + "Alt"

XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_STRING = XSD + "string"
XSD_INTEGER = XSD + "integer"
XSD_DECIMAL = XSD + "decimal"
XSD_BOOLEAN = XSD + "boolean"
XSD_DATETIME = XSD + "dateTime"

RR = "http://www.w3.org/ns/r2rml#"
RML = "http://semweb.mmlab.be/ns/rml#"
XRR = "http://i3s.unice.fr/xr2rml#"

# term types
RR_IRI = RR + "IRI"
RR_LITERAL = RR + "Literal"
RR_BLANKNODE = RR + "BlankNode"
XRR_RDFLIST = XRR + "RdfList"
XRR_RDFBAG = XRR + "RdfBag"
XRR_RDFSEQ = XRR + "RdfSeq"
XRR_RDFALT = XRR + "RdfAlt"

COLLECTION_TERM_TYPES = {XRR_RDFLIST, XRR_RDFBAG, XRR_RDFSEQ, XRR_RDFALT}

# reference formulations
REFFORM_COLUMN = XRR + "Column"
REFFORM_JSONPATH = XRR + "JSONPath"
REFFORM_XPATH = XRR + "XPath"

# container membership base (rdf:_1, rdf:_2, ...)
def rdf_li(i: int) -> str:
    return f"{RDF}_{i}"
