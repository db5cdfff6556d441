-- generated: QueryGenerator.statsWalkQuery(seed = 5045,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM embeddings v1, embeddings v2, documents d1, documents d2 WHERE v2.label = v1.label AND d1.doc_id = v2.vec_id AND d2.lang = d1.lang AND d1.source = 'src15' AND d2.lang = 'en' AND d2.source = 'src16'
