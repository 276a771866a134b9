"""DataFrame pipeline stages: every stage is a pure
``DataFrame -> DataFrame`` function; Catalyst owns the physical plan."""
