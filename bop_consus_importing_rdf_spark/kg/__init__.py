from .synth import synth_transcripts, alias_table  # noqa: F401
from .mentions import detect_mentions  # noqa: F401
from .linking import link_entities  # noqa: F401
from .cc import connected_components  # noqa: F401
from .pipeline import build_kg  # noqa: F401
