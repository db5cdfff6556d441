-- generated: QueryGenerator.statsWalkQuery(seed = 5015,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM documents d1, documents d2, documents d3, embeddings v1, embeddings v2 WHERE d2.lang = d1.lang AND d3.lang = d1.lang AND v1.vec_id = d3.doc_id AND v2.label = v1.label AND d3.source = 'src4' AND d2.lang = 'es' AND d2.n_chars < 500 AND d3.lang <> 'de'
