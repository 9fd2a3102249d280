"""web2llmstxt_spark — a PySpark-native crawl-and-distill analytics engine.

A from-scratch reimplementation of the capabilities of the reference repo
Hrishikeshgupta2002/web2llmstxt (a web crawler + llms.txt distiller) as an
idiomatic PySpark engine:

- a partitioned, priority-ordered URL frontier advanced in BSP supersteps
  (``operators/frontier.py``), host-hash partitioned, with a partition-local
  Bloom URL-seen pre-filter merged per superstep (``operators/bloom.py``),
- robots.txt Disallow enforcement and per-host politeness budgets
  (``operators/politeness.py``, ``operators/robots.py``),
- all row-wise logic as vectorized pandas/Arrow UDFs whose pure-Python twins
  (``functions/kernels.py``) also power the single-threaded oracle
  (``oracle/crawl_oracle.py``) used for exact crawl-order / URL-seen parity
  tests,
- the distill stage (descriptions, categorization, llms.txt / llms-full.txt /
  JSON / YAML sinks) in ``plans/distill.py`` + ``sinks/writers.py``,
- large-scale training-data operators (dedup, similarity search, text
  analysis) in ``operators/{dedup,similarity,textstats}.py``.

Reference semantics are cited per function as ``file:line`` into
``/root/reference`` (v2 crawler/generator lines are original source lines
recovered from the shipped CPython 3.12 bytecode, marked ``(pyc)``).
"""

__version__ = "0.1.0"
