from .numeric import exact_avg, exact_sum, DSUM_SQL, DAVG_SQL

__all__ = ["exact_avg", "exact_sum", "DSUM_SQL", "DAVG_SQL"]
