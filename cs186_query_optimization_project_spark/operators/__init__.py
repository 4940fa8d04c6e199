"""DataFrame-level operator combinators covering SURVEY.md §2 categories
that sit outside the fluent builder: set operations, window/analytic
functions, top-k, sessionization, and pivot.  Each is a plain function
``DataFrame -> DataFrame`` built from declarative Spark ops so Catalyst
owns the physical plan."""
