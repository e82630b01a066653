from apd_map_reduce_spark.plans.layout import spread

__all__ = ["spread"]
