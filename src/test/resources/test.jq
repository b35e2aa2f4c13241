. + {test: 1}
