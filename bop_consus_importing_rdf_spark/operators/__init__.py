from .cleanup import (  # noqa: F401
    remove_lowercase_dataset_typo,
    dataset_subjects,
    drop_blank_identifiers,
)
from .closure import reachable_closure, subgraph_triples  # noqa: F401
from .split import split_datasets  # noqa: F401
from .manifest import with_counter, manifest, duplicate_warnings  # noqa: F401
from .diff import harvest_diff  # noqa: F401
from .bgp import bgp_match  # noqa: F401
from .expectations import validate_corpus  # noqa: F401
from .pretrain import mix_domains  # noqa: F401
from .bpe import bpe_train, bpe_segment  # noqa: F401
from .dedup import substring_dedup, prefix_jaccard_join  # noqa: F401
