"""Query inventory — registers every implemented operator/query.

One `register(...)` call per SURVEY.md §2 line item (plus the
beyond-reference training-data operators). Column names are aliased
identically in the Spark plan and the oracle SQL — the driver's
compare hashes values under sorted column names.
"""

from __future__ import annotations

from global_superstore_data_warehouse_spark.plans import views
from global_superstore_data_warehouse_spark.registry import register

# --- Analytical views (reference mat views + Business_Template set) ---
register("yearly_sales_profit", views.yearly_sales_profit, views.yearly_sales_profit_oracle())
register("sales_employees_regions", views.sales_employees_regions, views.sales_employees_regions_oracle())
register("pricing_summary", views.pricing_summary, views.pricing_summary_oracle())
register("demand_category_region", views.demand_category_region, views.demand_category_region_oracle())
register("segment_sales", views.segment_sales, views.segment_sales_oracle())
register("seasonality_segment", views.seasonality_segment, views.seasonality_segment_oracle())
register("priority_distribution", views.priority_distribution, views.priority_distribution_oracle())
