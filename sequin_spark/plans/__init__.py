from sequin_spark.plans.spec import ConsumerSpec, load_yaml, plan

__all__ = ["ConsumerSpec", "load_yaml", "plan"]
