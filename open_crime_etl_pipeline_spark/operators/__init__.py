from .merge import dedup_last_writer_wins, merge_upsert

__all__ = ["dedup_last_writer_wins", "merge_upsert"]
