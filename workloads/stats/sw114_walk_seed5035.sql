-- generated: QueryGenerator.statsWalkQuery(seed = 5035,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM documents d1, documents d2, documents d3, embeddings v1 WHERE d2.lang = d1.lang AND d3.lang = d2.lang AND v1.vec_id = d2.doc_id AND d2.lang <> 'en' AND v1.label < 4 AND d1.lang = 'fr' AND d2.source = 'src14'
