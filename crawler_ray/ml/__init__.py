"""Model-backed classification: TF-IDF feature layer, seeded offline
training, artifact discovery, actor-pool scoring (SURVEY §2 F6/O8/A11)."""
