"""PySpark-native analytics engine with the query and data-processing
capabilities of TheDataMaven1985/DoeEcommerce_DataPipeline.

Brand-new, Spark-first implementation (DataFrame/SQL + Catalyst), not a
translation of the reference's pandas/Postgres pipeline. See SURVEY.md
for the operator inventory this package covers.
"""

__version__ = "0.1.0"
