"""Query modules. Each module registers operators into
:mod:`trike_spark.registry` at import time."""
