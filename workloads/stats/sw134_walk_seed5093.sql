-- generated: QueryGenerator.statsWalkQuery(seed = 5093,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM embeddings v1, embeddings v2, documents d1 WHERE v2.label = v1.label AND d1.doc_id = v1.vec_id AND v2.label < 2 AND v1.label < 4 AND d1.lang = 'en'
