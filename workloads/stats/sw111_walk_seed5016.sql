-- generated: QueryGenerator.statsWalkQuery(seed = 5016,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM documents d1, documents d2, documents d3 WHERE d2.lang = d1.lang AND d3.lang = d1.lang AND d2.lang = 'de' AND d1.source = 'src11'
