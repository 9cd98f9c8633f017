"""Query front-ends: the Lucene-ish expression compiler."""
