from .lineage import stage_metrics, union_metrics  # noqa: F401
from .resume import remaining_conversations, run_resumable  # noqa: F401
