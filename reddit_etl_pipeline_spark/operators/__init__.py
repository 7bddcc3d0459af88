from .upsert import upsert_anti_join, upsert_latest_wins  # noqa: F401
