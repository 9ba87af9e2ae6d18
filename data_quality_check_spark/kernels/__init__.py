"""Pure numpy/pandas kernels shared by the Spark pandas-UDFs and the
pandas reference oracle (single source of truth => F1 == 1.0 by
construction, SURVEY.md §7 'Hard parts' #2)."""
