from idzebra_spark.plans.query import parse, Query

__all__ = ["parse", "Query"]
