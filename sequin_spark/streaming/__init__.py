from sequin_spark.streaming.delivery import DeliveryEngine
from sequin_spark.streaming.pipeline import ConsumerPipeline

__all__ = ["DeliveryEngine", "ConsumerPipeline"]
