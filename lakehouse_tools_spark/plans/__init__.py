from lakehouse_tools_spark.plans.pipeline import create_data_profile, ProfileResult

__all__ = ["create_data_profile", "ProfileResult"]
