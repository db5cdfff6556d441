-- generated: QueryGenerator.statsWalkQuery(seed = 5010,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM embeddings v1, documents d1, embeddings v2, documents d2, embeddings v3, documents d3 WHERE d1.doc_id = v1.vec_id AND v2.label = v1.label AND d2.lang = d1.lang AND v3.vec_id = d2.doc_id AND d3.doc_id = v2.vec_id AND d1.source = 'src18' AND d1.lang = 'de' AND d3.source = 'src0' AND v2.label > 3
