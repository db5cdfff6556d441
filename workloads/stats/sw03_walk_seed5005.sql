-- generated: QueryGenerator.statsWalkQuery(seed = 5005,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM embeddings v1, documents d1, documents d2, documents d3 WHERE d1.doc_id = v1.vec_id AND d2.doc_id = v1.vec_id AND d3.lang = d2.lang AND d2.source = 'src9' AND d3.source = 'src2' AND d1.lang = 'fr'
