"""Crawl pipelines: the serial conformance oracle and the Ray Data engine
(strict priority-replay mode + relaxed wave mode)."""
