from .flagship import FlagshipParams, flagship_per_query_mae, flagship_summary

__all__ = ["FlagshipParams", "flagship_per_query_mae", "flagship_summary"]
