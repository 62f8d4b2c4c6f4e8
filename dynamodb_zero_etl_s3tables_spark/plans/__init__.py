from dynamodb_zero_etl_s3tables_spark.plans.pipeline import Pipeline, Stage

__all__ = ["Pipeline", "Stage"]
