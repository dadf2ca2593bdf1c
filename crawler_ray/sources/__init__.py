"""Sources and sinks: corpus fetch-join store, robots/sitemap parsing."""
