from .core import round_half_up, sql_round_half_up, dsum, sql_dsum, davg, sql_davg  # noqa: F401
