"""Driver-side orchestration: the wave-structured crawl loop."""
