"""Ray-Data-native full-text engine (Lucene.Net-capability rebuild)."""
