-- generated: QueryGenerator.statsWalkQuery(seed = 5075,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM documents d1, embeddings v1, documents d2 WHERE v1.vec_id = d1.doc_id AND d2.doc_id = v1.vec_id AND d1.source = 'src11' AND d2.n_chars < 150
