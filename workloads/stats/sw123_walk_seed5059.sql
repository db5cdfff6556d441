-- generated: QueryGenerator.statsWalkQuery(seed = 5059,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM documents d1, documents d2, embeddings v1, documents d3, embeddings v2, embeddings v3 WHERE d2.lang = d1.lang AND v1.vec_id = d2.doc_id AND d3.lang = d2.lang AND v2.label = v1.label AND v3.vec_id = d2.doc_id AND v1.label < 6 AND d1.source = 'src18'
