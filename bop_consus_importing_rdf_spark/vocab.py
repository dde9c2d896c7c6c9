"""RDF vocabulary constants.

Mirrors the constants the reference pulls from Jena
(``org.apache.jena.vocabulary.RDF`` / ``DCAT`` / ``DCTerms``, imported at
reference ``Flows.kt:17-21``). Plain strings — they fold into Catalyst
literals, so every comparison against them is whole-stage-codegen'd.
"""

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

DCAT_NS = "http://www.w3.org/ns/dcat#"
DCAT_DATASET = DCAT_NS + "Dataset"  # the class (uppercase)
# the lowercase *property* — the publisher typo the reference deletes
# before splitting (Flows.kt:103, `DCAT.dataset`)
DCAT_DATASET_PROP = DCAT_NS + "dataset"
DCAT_CATALOG = DCAT_NS + "Catalog"

DCT_NS = "http://purl.org/dc/terms/"
DCT_IDENTIFIER = DCT_NS + "identifier"

XSD_NS = "http://www.w3.org/2001/XMLSchema#"
XSD_STRING = XSD_NS + "string"

# object-kind tags used throughout the triple tables
KIND_IRI = "iri"
KIND_BNODE = "bnode"
KIND_LITERAL = "literal"

# Hydra paging vocabulary (reference: HydraPaging.findPaging from
# piveau-utils, consumed at Flows.kt:83-86)
HYDRA_NS = "http://www.w3.org/ns/hydra/core#"
HYDRA_PAGED_COLLECTION = HYDRA_NS + "PagedCollection"
HYDRA_TOTAL_ITEMS = HYDRA_NS + "totalItems"
HYDRA_NEXT_PAGE = HYDRA_NS + "nextPage"

# namespace for entities/predicates minted by the KG-construction extension
KG_NS = "urn:kg:"
KG_MENTIONS = KG_NS + "pred:mentions"
KG_SAME_AS = KG_NS + "pred:sameAs"
KG_FROM_TURN = KG_NS + "pred:fromTurn"
