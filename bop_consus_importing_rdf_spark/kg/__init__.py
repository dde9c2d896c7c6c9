from .synth import synth_transcripts, alias_table  # noqa: F401
from .mentions import detect_mentions  # noqa: F401
from .linking import link_entities  # noqa: F401
from .cc import connected_components  # noqa: F401
from .pipeline import build_kg  # noqa: F401
from .pagerank import pagerank  # noqa: F401
from .negatives import corrupt_triples  # noqa: F401
from .cooccur import cooccurrence_pmi  # noqa: F401
from .triangles import triangle_counts, k_core  # noqa: F401
from .walks import graph_random_walks  # noqa: F401
from .pipeline import sft_examples  # noqa: F401
