SELECT r_name FROM region INTO OUTFILE '/tmp/regions.csv'
